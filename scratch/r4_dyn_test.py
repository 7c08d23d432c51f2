import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bitar_tpu.ops.pallas.lz4_match_dyn import detect_offsets, find_matches_dyn

BLOCK = 128 * 1024
NROWS = BLOCK // 128
N = 64
rng = np.random.default_rng(2026)
planes = np.zeros((N, BLOCK), np.uint8)
for i in range(N):
    k = i % 4
    if k == 0:
        p = ((b"The quick brown fox jumps over the lazy dog %d. " % i) * (BLOCK // 47 + 1))[:BLOCK]
    elif k == 1:
        p = rng.integers(0, 16, BLOCK, dtype=np.uint8).tobytes()
    elif k == 2:
        p = rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes()
    else:
        p = bytes([i & 0xFF]) * BLOCK
    planes[i] = np.frombuffer(p, np.uint8)

dpl = jax.device_put(jnp.asarray(planes))
t0 = time.perf_counter()
offs, cnt = detect_offsets(dpl)
offs_h = np.asarray(offs); cnt_h = np.asarray(cnt)
print(f"detector compile+run {time.perf_counter()-t0:.1f}s", flush=True)
for i in (0, 1, 2, 3):
    print(f"blk {i}: offs={offs_h[i].tolist()} cnt={cnt_h[i].tolist()}", flush=True)
noff = jnp.asarray((offs_h > 0).sum(axis=1).astype(np.int32))
t0 = time.perf_counter()
mlen, moff = find_matches_dyn(dpl.reshape(N, NROWS, 128), noff, offs, nrows=NROWS)
ml = np.asarray(mlen).reshape(N, -1); mo = np.asarray(moff).reshape(N, -1)
print(f"matcher compile+run {time.perf_counter()-t0:.1f}s", flush=True)
bad = 0
for i in range(0, N, 7):
    pl_ = planes[i]
    pos = np.flatnonzero(ml[i] >= 6)
    for p in pos[::max(1, len(pos)//100)] if len(pos) else pos:
        m, d = int(ml[i][p]), int(mo[i][p])
        e = min(p + m, BLOCK)
        if not (pl_[p:e] == pl_[p-d:e-d]).all():
            bad += 1
print("prefix-true violations:", bad, flush=True)
def sync(r): np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
for name, fn in (("detect", lambda: detect_offsets(dpl)),
                 ("match_dyn", lambda: find_matches_dyn(dpl.reshape(N, NROWS, 128), noff, offs, nrows=NROWS))):
    r = fn(); sync(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            r = fn()
        sync(r)
        best = min(best, (time.perf_counter()-t0)/4)
    print(f"{name:10s}: {best*1e3:7.2f} ms for {N} blocks ({N*BLOCK/best/1e9:.3f} GB/s)", flush=True)
