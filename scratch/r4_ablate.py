"""Stage ablation of the fused device-compress pipeline at N=256."""
import sys, time, functools
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bitar_tpu.ops import device_compress as dc
from bitar_tpu.ops.pallas.lz4_match_dyn import detect_offsets, find_matches_dyn

BLOCK = 128 * 1024
N = 256
NROWS = BLOCK // 128
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
dlen = jax.device_put(jnp.full(N, BLOCK, np.int32))

def stage(planes, lengths, upto, seg=512, min_match=6, ow=4096):
    n, L = planes.shape
    nrows = L // 128
    offs, _ = detect_offsets(planes, max_off=min(0xFFFF, L - 128))
    noff = (offs > 0).sum(axis=1).astype(jnp.int32)
    if upto == "detect":
        return noff
    mlen, moff = find_matches_dyn(planes.reshape(n, nrows, 128), noff, offs,
                                  nrows=nrows, max_match=512)
    if upto == "match":
        return mlen
    layout = dc.parse_and_size(mlen.reshape(n, L), moff.reshape(n, L),
                               lengths, seg=seg, min_match=min_match, length=L)
    if upto == "parse":
        return layout["total"]
    out = dc.materialize(planes, layout, out_width=ow)
    return out, layout["total"]

fns = {}
for upto in ("detect", "match", "parse", "mat"):
    fns[upto] = jax.jit(functools.partial(stage, upto=upto),
                        static_argnames=())

prev = 0.0
for upto in ("detect", "match", "parse", "mat"):
    f = fns[upto]
    r = f(dpl, dlen)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            r = f(dpl, dlen)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        best = min(best, (time.perf_counter()-t0)/4)
    print(f"upto {upto:6s}: {best*1e3:8.2f} ms  (+{(best-prev)*1e3:7.2f} ms marginal, "
          f"{N*BLOCK/best/1e9:.3f} GB/s cumulative)", flush=True)
    prev = best
