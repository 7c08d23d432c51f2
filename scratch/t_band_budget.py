import sys, numpy as np
sys.path.insert(0, '/root/repo')
import jax; jax.config.update("jax_platforms", "cpu")
from bitar_tpu.ops.cpu import native

rng = np.random.default_rng(42)
for block in (64*1024, 128*1024):
    nrows = block // 128
    datas = [
        (b"static band gather " * (block // 19 + 1))[:block],
        rng.integers(0, 8, block, dtype=np.uint8).tobytes(),
        rng.integers(0, 4, block, dtype=np.uint8).tobytes(),
        b"\x5a" * block,
        rng.integers(0, 256, block, dtype=np.uint8).tobytes(),
    ]
    comps = [np.asarray(native.lz4_compress(d)) for d in datas]
    src = np.concatenate(comps)
    lens = np.array([len(c) for c in comps], np.int32)
    off = np.zeros(len(comps), np.int64); off[1:] = np.cumsum(lens[:-1])
    for mp in (96, 128, 160, 192, 256):
        se, sh, pu, p0, st, _ = native.plan_batch_flat(
            src, off, lens, np.full(len(comps), block, np.int32),
            np.zeros(len(comps), np.int32), nrows, mp, cb=4, band_rows=256)
        print(f"block={block//1024}K mp={mp}: st={st.tolist()} pu={pu.tolist()}")
        if (st == 0).all():
            break
