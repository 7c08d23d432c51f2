import sys, os, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
import bitar_tpu as bt
from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.pallas.lz4_decode_flat import (
    KBAND, flatten_batch_plans, compute_bands, decode_blocks_flat, bias_planes)

BLOCK = 128 * 1024
NROWS = BLOCK // 128
NBLOCKS = 64
rng = np.random.default_rng(2026)
parts = []
for i in range(NBLOCKS):
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

comps = [np.asarray(native.lz4_compress(p)) for p in parts]
src = np.concatenate(comps)
lens = np.array([len(c) for c in comps], np.int32)
off = np.zeros(NBLOCKS, np.int64); off[1:] = np.cumsum(lens[:-1])
out_len = np.full(NBLOCKS, BLOCK, np.int32)
ids = np.zeros(NBLOCKS, np.int32)

comp_rows = -(-int(lens.max()) // 128)
comp_rows = -(-comp_rows // 128) * 128
comp_rows = -(-comp_rows // KBAND) * KBAND
cp = np.zeros((NBLOCKS, comp_rows * 128), np.uint8)
for i, c in enumerate(comps):
    cp[i, :len(c)] = c
planes = bias_planes(jnp.asarray(cp), comp_rows)

def run(tag, band_rows, mp, static):
    se, sh, pu, p0, st, _ = native.plan_batch_flat(
        src, off, lens, out_len, ids, NROWS, mp, cb=4, band_rows=band_rows)
    assert (st == 0).all(), st
    plans = flatten_batch_plans(se, sh, pu, p0, NROWS)
    bands = None
    if band_rows or max(comp_rows, NROWS) > 1024:
        bands = jnp.asarray(compute_bands(plans, comp_rows, NROWS))
    args = (planes, jnp.asarray(plans["p_used"]), jnp.asarray(plans["p_off"]),
            jnp.asarray(plans["p0"]), jnp.asarray(plans["se"]),
            jnp.asarray(plans["shift"]), bands)
    kw = dict(comp_rows=comp_rows, out_rows=NROWS, static_bands=static)
    r = decode_blocks_flat(*args, **kw)
    np.asarray(r[0, 0])  # sync
    t0 = time.perf_counter()
    REPS = 8
    for _ in range(REPS):
        r = decode_blocks_flat(*args, **kw)
    np.asarray(r[:, -1, -1])
    dt = (time.perf_counter() - t0) / REPS
    gbps = NBLOCKS * BLOCK / dt / 1e9
    print(f"{tag}: mean_pass={pu.mean():.1f} S={plans['se'].shape[0]} "
          f"{dt*1e3:.2f} ms/launch ({gbps:.3f} GB/s)")

run("full-K       (band=0, mp=96)", 0, 96, False)
run("dyn bands    (band=0, mp=96)", 0, 96, False) if False else None
run("static bands (band=256,mp=160)", 256, 160, True)
run("static bands (band=256,mp=128)", 256, 128, True)
