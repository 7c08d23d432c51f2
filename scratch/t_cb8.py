import sys
sys.path.insert(0, '/root/repo')
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
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
for cb in (4, 8, 16):
    se, sh, pu, p0, st, _ = native.plan_batch_flat(
        src, off, lens, np.full(NBLOCKS, BLOCK, np.int32),
        np.zeros(NBLOCKS, np.int32), NROWS, 160, cb=cb)
    print(f"cb={cb}: mean passes {pu.mean():.1f} (ok={int((st==0).sum())})")
