import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np, jax, jax.numpy as jnp

N, OW, M = 64, 131712, 22017
rng = np.random.default_rng(0)
# monotone starts per row
sizes = rng.integers(0, 13, (N, M-1)).astype(np.int32)
starts = np.concatenate([np.zeros((N,1), np.int32), np.cumsum(sizes, 1)], 1)
dstarts = jax.device_put(starts)
planes = jax.device_put(rng.integers(0, 256, (N, 131072), np.uint8))
t = jnp.broadcast_to(jnp.arange(OW, dtype=jnp.int32)[None], (N, OW))

def sync(r):
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])

@jax.jit
def f_vmap_ss(s):
    return jax.vmap(lambda ss, tt: jnp.searchsorted(ss, tt, side="right"))(s, t) - 1

@jax.jit
def f_handbs(s):
    lo = jnp.zeros((N, OW), jnp.int32)
    hi = jnp.full((N, OW), M - 1, jnp.int32)
    for _ in range(15):  # ceil(log2(M))
        mid = (lo + hi + 1) >> 1
        v = jnp.take_along_axis(s, mid, axis=1)
        ge = v <= t
        lo = jnp.where(ge, mid, lo)
        hi = jnp.where(ge, hi, mid - 1)
    return lo

@jax.jit
def f_gather(k):
    return jnp.take_along_axis(dstarts, k, axis=1)

@jax.jit
def f_plane_gather(k):
    idx = jnp.clip(k, 0, 131071)
    return jnp.take_along_axis(planes, idx, axis=1)

def timeit(name, fn, *a):
    r = fn(*a); sync(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4): r = fn(*a)
        sync(r)
        best = min(best, (time.perf_counter()-t0)/4)
    print(f"{name:14s}: {best*1e3:9.2f} ms")
    return r

k2 = timeit("hand-bsearch", f_handbs, dstarts)
timeit("gather-starts", f_gather, k2)
timeit("gather-planes", f_plane_gather, k2)
k1 = timeit("vmap-searchso", f_vmap_ss, dstarts)
print("agree:", bool(jnp.all(k1 == k2).block_until_ready()))
