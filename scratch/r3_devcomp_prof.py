import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np, jax, jax.numpy as jnp
from bitar_tpu.ops.device_compress import parse_and_size, materialize, lz4_bound
from bitar_tpu.ops.pallas.lz4_match import find_matches, DEFAULT_OFFSETS

BLOCK = 128 * 1024
N, SEG = 64, 512
rng = np.random.default_rng(2026)
planes = np.zeros((N, BLOCK), np.uint8)
for i in range(N):
    k = i % 4
    if k == 0: p = (b"The quick brown fox %d. " % i) * (BLOCK // 22 + 1)
    elif k == 1: p = rng.integers(0, 16, BLOCK, np.uint8).tobytes()
    elif k == 2: p = rng.integers(0, 256, BLOCK, np.uint8).tobytes()
    else: p = bytes([i & 0xFF]) * BLOCK
    planes[i] = np.frombuffer(p[:BLOCK], np.uint8)
lengths = np.full(N, BLOCK, np.int32)
dplanes = jax.device_put(planes); dlengths = jax.device_put(lengths)
np.asarray(dplanes[0, :1])
nrows = BLOCK // 128
off_map = jnp.asarray(np.asarray(DEFAULT_OFFSETS, np.int32))

def stage_match():
    mlen, oidx = find_matches(dplanes.reshape(N, nrows, 128), offsets=DEFAULT_OFFSETS,
                              nrows=nrows, max_match=512)
    return mlen, oidx

@jax.jit
def stage_moff(oidx):
    return off_map[oidx.reshape(N, BLOCK)]

def stage_parse(mlen, moff):
    return parse_and_size(mlen.reshape(N, BLOCK), moff, dlengths,
                          seg=SEG, min_match=6, length=BLOCK)

W = -(-lz4_bound(BLOCK) // 128) * 128
def stage_mat(layout):
    return materialize(dplanes, layout, out_width=W)

def timeit(name, fn, *a):
    r = fn(*a)
    jax.block_until_ready(r); np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            r = fn(*a)
        jax.block_until_ready(r); np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
        best = min(best, (time.perf_counter()-t0)/2)
    print(f"{name:12s}: {best*1e3:9.2f} ms  ({N*BLOCK/best/1e9:.3f} GB/s)")
    return r

m = timeit("match", stage_match)
mo = timeit("moff", stage_moff, m[1])
lay = timeit("parse", stage_parse, m[0], mo)
out = timeit("materialize", stage_mat, lay)
