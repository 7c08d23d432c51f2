"""Cold-path breakdown: ensure_plans phases + commit upload rate."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import bitar_tpu as bt
from bitar_tpu.ops.cpu import native
sys.path.insert(0, '/root/repo')
from bench import make_corpus, BLOCK

NB = 1024
data = make_corpus(NB)
cfg = bt.EngineConfig(codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=NB,
                      max_pool_slots=NB + 32, commit="deferred",
                      use_tpu_kernels=True)
eng = bt.Engine(cfg).initialize()
t0 = time.perf_counter(); unit = eng.compress(data)
print(f"compress: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
eng.recycle(unit)
t0 = time.perf_counter(); unit2 = eng.compress(data)
print(f"compress warm: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

native.plan_prof()
t0 = time.perf_counter()
eng.ensure_plans(unit2)
plan_ms = (time.perf_counter()-t0)*1e3
prof = native.plan_prof()
print(f"ensure_plans: {plan_ms:.0f} ms; native phases (thread-summed ms): "
      + " ".join(f"{k}={v:.0f}" for k, v in prof.items()), flush=True)

t0 = time.perf_counter()
eng._ensure_committed(unit2)
up_ms = (time.perf_counter()-t0)*1e3
comp_bytes = int(unit2.manifest.comp_len.sum())
print(f"commit upload: {up_ms:.0f} ms for {comp_bytes/1e6:.0f} MB "
      f"({comp_bytes/up_ms/1e6:.2f} GB/s)", flush=True)

t0 = time.perf_counter()
launch = eng.prepare_device_decode(unit2)
o = launch(); np.asarray(o[0, 0, :1])
print(f"prepare+launch+sync: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
eng.recycle(unit2); eng.release()
