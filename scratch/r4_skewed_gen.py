"""Generate SKEWED_r04.json: config-4 skewed suite, lz4+zstd+snappy,
with on-chip device_GBps alongside the latency distribution."""
import sys, json, time
sys.path.insert(0, '/root/repo')
import numpy as np
import bitar_tpu as bt
from bitar_tpu.cli.demo import evaluate_skewed

runs = []
for codec in (bt.Codec.LZ4, bt.Codec.ZSTD, bt.Codec.SNAPPY):
    cfg = bt.EngineConfig(
        codec=codec, block_size=128 * 1024, burst_size=8,
        max_pool_slots=560, commit="deferred", use_tpu_kernels=True)
    eng = bt.Engine(cfg).initialize()
    res = evaluate_skewed(eng, 512)
    eng.release()
    runs.append(dict(
        block_size_max=128 * 1024,
        size_distribution="log-uniform 4 KiB..128 KiB, 512 blocks, mixed entropy",
        codec=codec.value,
        result={k: v for k, v in res.items() if k != "burst_lat_ms"},
        burst_lat_ms=res["burst_lat_ms"][:16] + ["..."],
    ))
    print(codec.value, "done", flush=True)

art = dict(
    config="BASELINE config 4: skewed block-size distribution, per-block latency + on-chip throughput",
    device="TPU v5 lite (dev tunnel)",
    runs=runs,
    notes=[
        "latency := block's burst completion relative to first submit "
        "(reference async suite's first-launch-to-callback window, "
        "demo_app.cc:548-693); per-burst completion via a tiny 1-byte "
        "device-sliced readback, so the distribution samples decode+queueing "
        "while total_ms/GBps measure the link (one round trip per burst)",
        "device_GBps is the on-chip number: identical launches, ONE sync "
        "(round-4 addition; the round-3 artifact had latency shape only)",
    ])
with open('/root/repo/SKEWED_r04.json', 'w') as f:
    json.dump(art, f, indent=1)
print("wrote SKEWED_r04.json")
