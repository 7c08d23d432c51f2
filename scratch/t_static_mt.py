import sys, os, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
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
raw = np.frombuffer(b"".join(parts), np.uint8).reshape(NBLOCKS, NROWS, 128)

def run(tag, band_rows, band_tile, mt_max):
    se, sh, pu, p0, st, _ = native.plan_batch_flat(
        src, off, lens, out_len, ids, NROWS, 160, cb=4,
        band_rows=band_rows, band_tile=band_tile)
    assert (st == 0).all(), st
    plans = flatten_batch_plans(se, sh, pu, p0, NROWS)
    bands = jnp.asarray(compute_bands(plans, comp_rows, NROWS, mt_max=mt_max))
    assert int((np.asarray(bands) & 0xFF).max()) <= 1
    args = (planes, jnp.asarray(plans["p_used"]), jnp.asarray(plans["p_off"]),
            jnp.asarray(plans["p0"]), jnp.asarray(plans["se"]),
            jnp.asarray(plans["shift"]), bands)
    kw = dict(comp_rows=comp_rows, out_rows=NROWS, static_bands=True,
              mt_max=mt_max)
    t_c0 = time.perf_counter()
    r = decode_blocks_flat(*args, **kw)
    got = np.asarray(r)
    print(f"{tag}: compile+first {time.perf_counter()-t_c0:.1f}s "
          f"bit-exact={bool((got == raw).all())}", flush=True)
    for trial in range(2):
        t0 = time.perf_counter()
        REPS = 8
        for _ in range(REPS):
            r = decode_blocks_flat(*args, **kw)
        np.asarray(r[:, -1, -1])
        dt = (time.perf_counter() - t0) / REPS
        gbps = NBLOCKS * BLOCK / dt / 1e9
        print(f"{tag} t{trial}: mean_pass={pu.mean():.1f} S={plans['se'].shape[0]} "
              f"{dt*1e3:.2f} ms/launch ({gbps:.3f} GB/s)", flush=True)

run("static b256/t256 mt256", 256, 256, 256)
run("static b256/t512 mt512", 256, 512, 512)
run("static b256/t1024 mt1024", 256, 1024, 1024)
