"""Decide engine defaults: full-K vs static bands at 128 KiB, n=64/256,
lz4 and zstd, budget 160."""
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

def prep(nblocks, codec):
    parts = corpus(nblocks)
    if codec == "zstd":
        import zstandard
        comps, lit_plan = [], True
        comps = [np.frombuffer(zstandard.ZstdCompressor(level=3)
                 .compress(p), np.uint8) for p in parts]
        cid = 2
    else:
        comps = [np.asarray(native.lz4_compress(p)) for p in parts]
        cid = 0
    src = np.concatenate(comps)
    lens = np.array([len(c) for c in comps], np.int32)
    off = np.zeros(nblocks, np.int64); off[1:] = np.cumsum(lens[:-1])
    return parts, comps, src, lens, off, cid

def run(tag, nblocks, codec, band, mt_max):
    parts, comps, src, lens, off, cid = prep(nblocks, codec)
    lit_out = np.empty(nblocks * BLOCK, np.uint8) if codec == "zstd" else None
    se, sh, pu, p0, st, lu = native.plan_batch_flat(
        src, off, lens, np.full(nblocks, BLOCK, np.int32),
        np.full(nblocks, cid, np.int32), NROWS, 160, cb=4,
        band_rows=band, band_tile=(mt_max if band else 0),
        lit_out=lit_out, lit_stride=BLOCK)
    if not (st == 0).all():
        print(f"{tag}: PLAN FAIL {int((st != 0).sum())}/{nblocks}", flush=True)
        return
    plans = F.flatten_batch_plans(se, sh, pu, p0, NROWS)
    if codec == "zstd":
        plane_bytes = lu.astype(np.int64)
    else:
        plane_bytes = lens.astype(np.int64)
    comp_rows = max(128, -(-int(plane_bytes.max()) // 128))
    comp_rows = -(-comp_rows // 128) * 128
    if comp_rows > 128:
        comp_rows = -(-comp_rows // F.KBAND) * F.KBAND
    cp = np.zeros((nblocks, comp_rows * 128), np.uint8)
    for i in range(nblocks):
        if codec == "zstd":
            cp[i, :int(lu[i])] = lit_out[i * BLOCK:i * BLOCK + int(lu[i])]
        else:
            cp[i, :len(comps[i])] = comps[i]
    planes = F.bias_planes(jnp.asarray(cp), comp_rows)
    bands = None
    if band:
        bands = jnp.asarray(F.compute_bands(plans, comp_rows, NROWS, mt_max=mt_max))
        assert int((np.asarray(bands) & 0xFF).max()) <= 1
    raw = np.frombuffer(b"".join(parts), np.uint8).reshape(nblocks, NROWS, 128)
    args = (planes, jnp.asarray(plans["p_used"]), jnp.asarray(plans["p_off"]),
            jnp.asarray(plans["p0"]), jnp.asarray(plans["se"]),
            jnp.asarray(plans["shift"]), bands)
    kw = dict(comp_rows=comp_rows, out_rows=NROWS,
              static_bands=bool(band), mt_max=mt_max)
    t0 = time.perf_counter()
    try:
        r = F.decode_blocks_flat(*args, **kw)
        got = np.asarray(r)
    except Exception as e:
        print(f"{tag}: COMPILE/RUN FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        return
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s "
          f"exact={bool((got == raw).all())} mean_pass={pu.mean():.1f}", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        REPS = 8
        for _ in range(REPS):
            r = F.decode_blocks_flat(*args, **kw)
        np.asarray(r[:, -1, -1])
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{tag}: {best*1e3:.2f} ms ({nblocks*BLOCK/best/1e9:.3f} GB/s)", flush=True)

run("lz4  fullK  n64  mt1024", 64, "lz4", 0, 1024)
run("lz4  fullK  n256 mt1024", 256, "lz4", 0, 1024)
run("lz4  static n256 t512", 256, "lz4", 256, 512)
run("zstd fullK  n64  mt1024", 64, "zstd", 0, 1024)
run("zstd static n64  t512", 64, "zstd", 256, 512)
