import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, zstandard
from bitar_tpu.ops.cpu import native

BLOCK = 128 * 1024
NROWS = BLOCK // 128
rng = np.random.default_rng(2026)
kinds = {
    "text": (b"The quick brown fox jumps over the lazy dog 17. " * (BLOCK // 47 + 1))[:BLOCK],
    "lowent": rng.integers(0, 16, BLOCK, dtype=np.uint8).tobytes(),
    "rle": b"\x55" * BLOCK,
}
for name, d in kinds.items():
    for codec, comp in (("lz4", bytes(native.lz4_compress(d))),
                        ("zstd", zstandard.ZstdCompressor(level=3).compress(d))):
        src = np.frombuffer(comp, np.uint8)
        ids = np.array([0 if codec == "lz4" else 2], np.int32)
        lit = np.empty(BLOCK, np.uint8)
        se, sh, pu, p0, st, lu = native.plan_batch_flat(
            src, np.zeros(1, np.int64), np.array([len(comp)], np.int32),
            np.array([BLOCK], np.int32), ids, NROWS, 96, cb=4,
            lit_out=lit, lit_stride=BLOCK)
        # count sequences too
        if codec == "lz4":
            nseq = native.parse_sequences(comp, "lz4")["lit_ptr"].shape[0]
        else:
            t, L = native.zstd_parse(comp)
            nseq = t["lit_ptr"].shape[0]
        print(f"{name:7s} {codec:5s}: comp={len(comp):7d} nseq={nseq:6d} "
              f"P={pu[0]:3d} p0={p0[0]:3d} status={st[0]} lit={lu[0]}")
