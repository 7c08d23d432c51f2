import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
import bitar_tpu as bt
from bitar_tpu.ops.pallas.lz4_decode_flat import (
    bias_planes, decode_blocks_flat, compute_bands)

BLOCK = 128 * 1024
NBLOCKS = 64
def make_corpus(nblocks):
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

data = make_corpus(NBLOCKS)
cfg = bt.EngineConfig(codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=NBLOCKS,
                      max_pool_slots=NBLOCKS + 32, use_tpu_kernels=True)
eng = bt.Engine(cfg).initialize()
unit = eng.compress(data)
eng.ensure_plans(unit)
p = unit.plan_flat
comp_rows = unit.plan_comp_rows
nrows = BLOCK // 128
rows_dev = eng.arena.gather_burst([r.slot for r in unit.refs])
planes = bias_planes(rows_dev, comp_rows)
p_used = jnp.asarray(p["p_used"]); p_off = jnp.asarray(p["p_off"]); p0 = jnp.asarray(p["p0"])
se_dev, shift_dev = unit.plan_device_arrays()

variants = [
    ("full-K  mt=1024", None, 1024),
    ("banded  mt=512 ", 512, 512),
    ("banded  mt=256 ", 256, 256),
    ("banded  mt=128 ", 128, 128),
]
for tag, band_mt, mt in variants:
    bd = (jnp.asarray(compute_bands(p, comp_rows, nrows, mt_max=band_mt))
          if band_mt else None)
    def launch():
        return decode_blocks_flat(planes, p_used, p_off, p0, se_dev, shift_dev,
                                  bd, comp_rows=comp_rows, out_rows=nrows,
                                  mt_max=mt)
    t0 = time.perf_counter()
    o = launch(); np.asarray(o[0, 0, :1])
    compile_s = time.perf_counter() - t0
    host = np.asarray(o)
    ok = host.reshape(NBLOCKS, -1)[:, :BLOCK].reshape(-1).tobytes() == data
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        last = None
        for _ in range(16):
            last = launch()
        np.asarray(last[0, 0, :1])
        best = min(best, (time.perf_counter() - t0) / 16)
    print(f"{tag}: exact={ok} compile={compile_s:.0f}s "
          f"{best*1e3:.2f} ms ({len(data)/best/1e9:.3f} GB/s)",
          file=sys.stderr, flush=True)
eng.recycle(unit); eng.release()
