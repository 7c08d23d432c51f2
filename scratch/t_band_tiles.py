import sys, numpy as np
sys.path.insert(0, '/root/repo')
import jax; jax.config.update("jax_platforms", "cpu")
from bitar_tpu.ops.cpu import native

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

for tag, br, bt in [("full-K", 0, 0), ("b256/t1024", 256, 1024),
                    ("b256/t512", 256, 512), ("b256/t256", 256, 256),
                    ("b512/t1024", 512, 1024), ("b512/t512", 512, 512),
                    ("b256/t128", 256, 128)]:
    se, sh, pu, p0, st, _ = native.plan_batch_flat(
        src, off, lens, out_len, ids, NROWS, 160, cb=4,
        band_rows=br, band_tile=bt)
    nf = int((st != 0).sum())
    # relative per-pass gather cost (K/1024 out, comp similar) * passes
    relK = (br if br else 1024) / 1024
    print(f"{tag:11s}: fail={nf} mean_pass={pu.mean():6.1f} "
          f"rel_gather_cost={pu.mean()*relK:6.1f}")
