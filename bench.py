"""Driver benchmark: one JSON line with the headline metric.

Measures LZ4 block decompress on one chip (128 KiB blocks, mixed-entropy
corpus) through the plan-execute Pallas kernel, with a full engine-level
bit-exact round-trip as the correctness gate (the reference demo app's
memcmp oracle).

Measurement notes for this dev environment: the TPU is reached through a
network tunnel that (a) streams every launch's operands (~0.5-0.7 GB/s)
and (b) executes at a large constant slowdown vs. bare-metal v5e, and
``block_until_ready`` does not synchronize — so the timed phase forces
completion with a scalar readback and times the decode-kernel launch on
device-committed inputs.  vs_baseline reports value / 10 GB/s (the
BASELINE.json north star).

Run: ``python bench.py``; the LAST stdout line is the JSON record.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persist Mosaic compiles across bench runs (20-100s per kernel shape on
# the remote compiler otherwise).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

NORTH_STAR_GBPS = 10.0
BLOCK = 128 * 1024
NBLOCKS = 64


def make_corpus(nblocks: int) -> bytes:
    rng = np.random.default_rng(2026)
    parts = []
    for i in range(nblocks):
        k = i % 4
        if k == 0:
            p = (b"The quick brown fox jumps over the lazy dog %d. " % i) * (BLOCK // 47 + 1)
        elif k == 1:
            p = rng.integers(0, 16, BLOCK, dtype=np.uint8).tobytes()
        elif k == 2:
            p = rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes()
        else:
            p = bytes([i & 0xFF]) * BLOCK
        parts.append(p[:BLOCK])
    return b"".join(parts)


def sync(x):
    return np.asarray(x).ravel()[0]


def main() -> int:
    import jax
    import jax.numpy as jnp

    import bitar_tpu as bt
    from bitar_tpu.ops.pallas.lz4_decode_planned import decode_blocks_planned

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    data = make_corpus(NBLOCKS)

    cfg = bt.EngineConfig(
        codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=NBLOCKS,
        max_pool_slots=max(64, NBLOCKS + 32),
        use_tpu_kernels=on_tpu, interpret=not on_tpu)
    eng = bt.Engine(cfg).initialize()
    print(f"bench: backend={backend} device={eng.device} "
          f"bytes={len(data):,}", file=sys.stderr)

    unit = eng.compress(data)
    print(f"bench: ratio={unit.manifest.ratio():.3f} blocks={unit.nblocks} "
          f"planned={unit.plan_se is not None} passes={unit.plan_passes}",
          file=sys.stderr)

    # Correctness gate: full engine round-trip, byte-exact.
    out = eng.decompress(unit)
    assert out.tobytes() == data, "round-trip not bit-exact"
    print("bench: engine round-trip verified bit-exact", file=sys.stderr)

    # Timed phase: one decode-kernel launch over the whole batch on
    # device-committed inputs (single launch measured fastest under the
    # tunnel's per-launch costs; see git history for the bucketed A/B).
    nrows = BLOCK // 128
    comp_rows = unit.plan_comp_rows
    rows = np.asarray(eng.arena.gather_burst([r.slot for r in unit.refs]))
    planes_all = jnp.asarray(rows[:, :comp_rows * 128]
                             .reshape(NBLOCKS, comp_rows, 128))
    p_used_all = jnp.asarray(unit.plan_p_used)
    se_all = jnp.asarray(unit.plan_se.reshape(
        NBLOCKS, unit.plan_passes, nrows // 128, 128))
    shift_all = jnp.asarray(unit.plan_shift.reshape(
        NBLOCKS, unit.plan_passes, nrows // 128, 128))

    def run_single():
        o = decode_blocks_planned(planes_all, p_used_all, se_all, shift_all,
                                  passes=unit.plan_passes, comp_rows=comp_rows,
                                  out_rows=nrows, interpret=not on_tpu)
        sync(o)
        return [o]

    outs = run_single()  # warm-up / compile
    best = float("inf")
    for run in range(3):
        t0 = time.perf_counter()
        outs = run_single()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"bench: run {run}: {dt * 1e3:.1f} ms "
              f"({len(data) / dt / 1e9:.3f} GB/s)", file=sys.stderr)
    launches = [(list(range(NBLOCKS)), None, None)]

    # spot-check the timed path's output too
    for (idxs, _, _), o in zip(launches, outs):
        host = np.asarray(o)
        i = idxs[0]
        assert host[0].reshape(-1)[:BLOCK].tobytes() == \
            data[i * BLOCK:(i + 1) * BLOCK], "timed-path output mismatch"

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
