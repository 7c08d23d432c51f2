import os, time
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
from bitar_tpu.ops.cpu import native

BLOCK = 128 * 1024
NROWS = BLOCK // 128
rng = np.random.default_rng(0)
kinds = {
    "text": (b"The quick brown fox jumps over the lazy dog 123. " * (BLOCK // 47 + 1))[:BLOCK],
    "lowent": rng.integers(0, 16, BLOCK, dtype=np.uint8).tobytes(),
    "rle": b"\x55" * BLOCK,
}
for name, d in kinds.items():
    comp = np.asarray(native.lz4_compress(d))
    n = 16
    slot = len(comp)
    src = np.tile(comp, n)
    src_off = np.arange(n, dtype=np.int64) * slot
    src_len = np.full(n, slot, np.int32)
    out_len = np.full(n, BLOCK, np.int32)
    ids = np.zeros(n, np.int32)
    # warm
    native.plan_batch_flat(src, src_off, src_len, out_len, ids, NROWS, 96, cb=4)
    t0 = time.perf_counter()
    se, sh, pu, p0, st = native.plan_batch_flat(src, src_off, src_len, out_len, ids, NROWS, 96, cb=4, nthreads=1)
    dt = time.perf_counter() - t0
    nseq = native.parse_sequences(comp, "lz4")["lit_ptr"].shape[0]
    print(f"{name}: comp={len(comp)} nseq={nseq} P={pu[0]} p0={p0[0]} "
          f"{dt/n*1e3:.2f} ms/block single-thread")
