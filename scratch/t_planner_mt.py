import os, time
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
from bitar_tpu.ops.cpu import native

BLOCK = 128 * 1024
NROWS = BLOCK // 128
NB = 64
rng = np.random.default_rng(2026)
parts = []
for i in range(NB):
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

comps = []
ids = []
for p in parts:
    c = np.asarray(native.lz4_compress(p))
    if len(c) >= BLOCK:
        c = np.frombuffer(p, np.uint8)
        ids.append(3)
    else:
        ids.append(0)
    comps.append(c)
slot = 256 * 1024
src = np.zeros(NB * slot, np.uint8)
for i, c in enumerate(comps):
    src[i*slot:i*slot+len(c)] = c
src_off = np.arange(NB, dtype=np.int64) * slot
src_len = np.array([len(c) for c in comps], np.int32)
out_len = np.full(NB, BLOCK, np.int32)
ids = np.array(ids, np.int32)
for nt in (1, 4, 8, 16):
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        native.plan_batch_flat(src, src_off, src_len, out_len, ids, NROWS, 96, cb=4, nthreads=nt)
        best = min(best, time.perf_counter() - t0)
    print(f"nthreads={nt}: {best*1e3:.1f} ms")
