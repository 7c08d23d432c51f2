import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np, jax, jax.numpy as jnp

N, OW, M = 64, 131073, 22017
rng = np.random.default_rng(0)
sizes = rng.integers(0, 13, (N, M-1)).astype(np.int32)
starts = jax.device_put(np.concatenate([np.zeros((N,1), np.int32), np.cumsum(sizes, 1)], 1))
field = jax.device_put(rng.integers(0, 1<<17, (N, M), np.int32))
def sync(r): np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
bidx = jnp.broadcast_to(jnp.arange(N)[:, None], (N, M))
idx = jnp.minimum(starts[:, :M], OW)

@jax.jit
def f_plain(f):
    w = jnp.zeros((N, OW + 1), jnp.int32)
    return w.at[bidx, idx].set(f, mode="drop")[:, :OW]

@jax.jit
def f_hints(f):
    w = jnp.zeros((N, OW + 1), jnp.int32)
    return w.at[bidx, idx].set(f, mode="drop", unique_indices=True,
                               indices_are_sorted=True)[:, :OW]

@jax.jit
def f_1d(f):
    w = jnp.zeros(N * (OW + 1), jnp.int32)
    flat = (bidx * (OW + 1) + idx).reshape(-1)
    return w.at[flat].set(f.reshape(-1), mode="drop", unique_indices=True,
                          indices_are_sorted=True).reshape(N, OW+1)[:, :OW]

@jax.jit
def f_max(f):
    w = jnp.zeros((N, OW + 1), jnp.int32)
    return w.at[bidx, idx].max(f, mode="drop")[:, :OW]

def timeit(name, fn, *a):
    r = fn(*a); sync(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4): r = fn(*a)
        sync(r)
        best = min(best, (time.perf_counter()-t0)/4)
    print(f"{name:10s}: {best*1e3:8.2f} ms")

timeit("plain", f_plain, field)
timeit("hints", f_hints, field)
timeit("flat-1d", f_1d, field)
timeit("scat-max", f_max, field)
