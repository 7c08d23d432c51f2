"""Launch-size scaling of the real static-banded kernel."""
import sys, os, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
from bitar_tpu.ops.cpu import native
import bitar_tpu.ops.pallas.lz4_decode_flat as F

BLOCK = 128 * 1024
NROWS = BLOCK // 128

def corpus(nblocks):
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
    return parts

def run(tag, nblocks, band_tile, mt_max):
    parts = corpus(nblocks)
    comps = [np.asarray(native.lz4_compress(p)) for p in parts]
    src = np.concatenate(comps)
    lens = np.array([len(c) for c in comps], np.int32)
    off = np.zeros(nblocks, np.int64); off[1:] = np.cumsum(lens[:-1])
    se, sh, pu, p0, st, _ = native.plan_batch_flat(
        src, off, lens, np.full(nblocks, BLOCK, np.int32),
        np.zeros(nblocks, np.int32), NROWS, 160, cb=4,
        band_rows=256, band_tile=band_tile)
    assert (st == 0).all()
    plans = F.flatten_batch_plans(se, sh, pu, p0, NROWS)
    comp_rows = -(-int(lens.max()) // 128)
    comp_rows = -(-comp_rows // 128) * 128
    comp_rows = -(-comp_rows // F.KBAND) * F.KBAND
    cp = np.zeros((nblocks, comp_rows * 128), np.uint8)
    for i, c in enumerate(comps):
        cp[i, :len(c)] = c
    planes = F.bias_planes(jnp.asarray(cp), comp_rows)
    bands = jnp.asarray(F.compute_bands(plans, comp_rows, NROWS, mt_max=mt_max))
    raw = np.frombuffer(b"".join(parts), np.uint8).reshape(nblocks, NROWS, 128)
    args = (planes, jnp.asarray(plans["p_used"]), jnp.asarray(plans["p_off"]),
            jnp.asarray(plans["p0"]), jnp.asarray(plans["se"]),
            jnp.asarray(plans["shift"]), bands)
    kw = dict(comp_rows=comp_rows, out_rows=NROWS, static_bands=True,
              mt_max=mt_max)
    t0 = time.perf_counter()
    r = F.decode_blocks_flat(*args, **kw)
    got = np.asarray(r)
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s "
          f"exact={bool((got == raw).all())} S={plans['se'].shape[0]}", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        REPS = 8
        for _ in range(REPS):
            r = F.decode_blocks_flat(*args, **kw)
        np.asarray(r[:, -1, -1])
        best = min(best, (time.perf_counter() - t0) / REPS)
    gbps = nblocks * BLOCK / best / 1e9
    print(f"{tag}: {best*1e3:.2f} ms/launch ({gbps:.3f} GB/s, "
          f"{best*1e6/pu.sum():.2f} us/pass)", flush=True)

run("static t512 n64 ", 64, 512, 512)
run("static t512 n128", 128, 512, 512)
run("static t512 n256", 256, 512, 512)
