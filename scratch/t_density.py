"""How sparse are passes? Volume accounting for windowed/striped scheduling."""
import sys
sys.path.insert(0, '/root/repo')
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.pallas.lz4_decode_flat import flatten_batch_plans

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
se, sh, pu, p0, st, _ = native.plan_batch_flat(
    src, off, lens, np.full(NBLOCKS, BLOCK, np.int32),
    np.zeros(NBLOCKS, np.int32), NROWS, 160, cb=4)
assert (st == 0).all()

# se: [n, mp, nrows]; active = se != 0
tot_pass = 0
tot_cells = 0
vol_full = 0          # passes x nrows (current kernel volume)
vol_win = {128: 0, 256: 0, 512: 0}   # per-pass contiguous dst window (quantized)
vol_stripe = {256: 0, 128: 0}        # stripe-major rescheduling bound:
                                     # sum over stripes of (max cells/row in stripe)
for i in range(NBLOCKS):
    P = int(pu[i])
    a = se[i, :P] != 0               # [P, nrows]
    tot_pass += P
    cells = int(a.sum()); tot_cells += cells
    vol_full += P * NROWS
    for W in vol_win:
        for p in range(P):
            rows = np.flatnonzero(a[p])
            if rows.size == 0:
                vol_win[W] += 0
                continue
            span = int(rows[-1] - rows[0] + 1)
            vol_win[W] += max(W, -(-span // W) * W)
    # stripe bound (ignores out-dependencies; comp cells only estimate)
    cpr = a.sum(axis=0)              # cells per row
    for SW in vol_stripe:
        for s0 in range(0, NROWS, SW):
            d = int(cpr[s0:s0 + SW].max(initial=0))
            vol_stripe[SW] += d * SW
kinds = ["text", "lowent", "random", "rle"]
print(f"passes total={tot_pass} cells={tot_cells} "
      f"mean cells/row={tot_cells/ (NBLOCKS*NROWS):.1f}")
print(f"volume full  : {vol_full/1e6:.1f} M row-slots (1.00x)")
for W, v in vol_win.items():
    print(f"volume win{W:4d}: {v/1e6:.1f} M ({v/vol_full:.2f}x)")
for W, v in vol_stripe.items():
    print(f"volume stripe{W:4d}: {v/1e6:.1f} M ({v/vol_full:.2f}x) [reschedule bound]")
# per-kind pass counts
for k in range(4):
    idx = [i for i in range(NBLOCKS) if i % 4 == k]
    print(f"kind {kinds[k]:6s}: mean passes {pu[idx].mean():.1f}")
