import sys, numpy as np
sys.path.insert(0, '/root/repo')
import jax; jax.config.update("jax_platforms", "cpu")
from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.pallas.lz4_decode_flat import (
    flatten_batch_plans, compute_bands, bands_supported, decode_flat_numpy,
    KBAND)

rng = np.random.default_rng(0)
BS = 128 * 1024
NROWS = BS // 128

# corpus like bench.py: text-ish, rle, random
def make_block(kind):
    if kind == 0:
        words = [rng.bytes(rng.integers(3, 9)) for _ in range(50)]
        out = b''
        while len(out) < BS:
            out += words[rng.integers(0, 50)] + b' '
        return out[:BS]
    if kind == 1:
        return bytes(np.repeat(rng.integers(0, 256, BS // 64).astype(np.uint8), 64))
    return rng.bytes(BS)

blocks = [make_block(i % 3) for i in range(12)]
comp = [native.lz4_compress(np.frombuffer(b, np.uint8)) for b in blocks]
src = np.concatenate([np.frombuffer(c, np.uint8) if isinstance(c, bytes) else c for c in comp])
lens = np.array([len(c) for c in comp], np.int32)
off = np.zeros(len(comp), np.int64); off[1:] = np.cumsum(lens[:-1])
out_len = np.full(len(comp), BS, np.int32)
ids = np.zeros(len(comp), np.int32)

for br in (0, 256):
    se, sh, pu, p0, st, lu = native.plan_batch_flat(
        src, off, lens, out_len, ids, NROWS, 96, cb=4, band_rows=br)
    print(f"band_rows={br}: status={st.tolist()} p_used={pu.tolist()} p0={p0.tolist()} mean_pass={pu.mean():.1f}")
    if (st != 0).any():
        continue
    plans = flatten_batch_plans(se, sh, pu, p0, NROWS)
    comp_rows = max(128, -(-int(lens.max()) // 128))
    comp_rows = -(-comp_rows // KBAND) * KBAND
    assert bands_supported(comp_rows, NROWS)
    bands = compute_bands(plans, comp_rows, NROWS)
    cnt = bands & 0xFF
    print(f"  comp_rows={comp_rows} band cnt max={cnt.max()} (static-ok={cnt.max() <= 1})")
    # numpy-oracle correctness
    comp_bytes = [src[off[i]:off[i]+lens[i]] for i in range(len(comp))]
    dec = decode_flat_numpy(comp_bytes, plans, comp_rows, NROWS)
    ref = np.stack([np.frombuffer(b, np.uint8).reshape(NROWS, 128) for b in blocks])
    print("  oracle bit-exact:", bool((dec == ref).all()))
