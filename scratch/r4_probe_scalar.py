"""Probe: scalar VMEM reads at dynamic (row, lane); dynamic-row pl.ds reads;
masked unaligned 2-row stores — the emission-kernel primitives."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

N, NROWS, LANES = 8, 256, 128

def timeit(name, fn, *a, reps=8):
    try:
        r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    except Exception as e:
        print(f"{name:34s}: FAIL {str(e)[:140]}")
        return None
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        best = min(best, (time.perf_counter()-t0)/reps)
    print(f"{name:34s}: {best*1e6:9.1f} us")
    return r

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1000, (N, NROWS, LANES), np.int32))

# A: scalar VMEM read at dynamic (row, lane) in a fori loop, 1024 iters
def skernel(x_ref, o_ref, *, iters):
    def body(i, acc):
        r = (acc + i * 37) % NROWS
        l = (acc + i * 53) % LANES
        return acc + x_ref[0, r, l]
    o_ref[0, 0] = lax.fori_loop(0, iters, body, jnp.int32(0))

def scal(x, iters):
    k = functools.partial(skernel, iters=iters)
    return pl.pallas_call(
        k, grid=(N,),
        in_specs=[pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
    )(x)

r = timeit("scalar-read dyn(row,lane) x1024", jax.jit(functools.partial(scal, iters=1024)), x)
if r is not None:
    # verify against numpy
    xs = np.asarray(x)
    acc = 0
    for i in range(1024):
        acc = np.int32(acc + xs[0, (acc + i*37) % NROWS, (acc + i*53) % LANES])
    print("   verify:", int(np.asarray(r)[0,0]) == int(acc))

# B: dynamic-row pl.ds vector read (shift by dynamic rows) + dyn-lane take
def dkernel(x_ref, d_ref, o_ref, scratch):
    scratch[:NROWS] = x_ref[0]
    scratch[NROWS:] = x_ref[0]
    d = d_ref[0]
    q = d // 128
    rl = d % 128
    a = scratch[pl.ds(NROWS - q, NROWS)]          # rows i - q
    b = scratch[pl.ds(NROWS - q - 1, NROWS)]      # rows i - q - 1
    lane = lax.broadcasted_iota(jnp.int32, (NROWS, LANES), 1)
    ql = (lane - rl) & (LANES - 1)
    va = jnp.take_along_axis(a, ql, axis=1)
    vb = jnp.take_along_axis(b, ql, axis=1)
    o_ref[0] = jnp.where(lane >= rl, va, vb)

def dshift(x, d):
    return pl.pallas_call(
        dkernel, grid=(N,),
        in_specs=[pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, NROWS, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2 * NROWS, LANES), jnp.int32)],
    )(x, d)

d = jnp.asarray(np.array([259], np.int32))
r = timeit("dyn shift_back (pl.ds + take)", jax.jit(dshift), x, d)
if r is not None:
    xs = np.asarray(x)[0].reshape(-1)
    want = np.zeros_like(xs)
    want[259:] = xs[:-259]
    got = np.asarray(r)[0].reshape(-1)
    print("   verify (p>=259):", bool((got[259:] == want[259:]).all()))

# C: masked unaligned 2-row store in a fori loop (emission store shape)
def mkernel(x_ref, o_ref, *, iters):
    lane = lax.broadcasted_iota(jnp.int32, (2, LANES), 1)
    row2 = lax.broadcasted_iota(jnp.int32, (2, LANES), 0)
    pos2 = row2 * LANES + lane
    def body(i, c):
        start = (i * 37) % (NROWS * LANES - 300)
        r0 = start // 128
        l0 = start % 128
        val = jnp.full((2, LANES), i, jnp.int32)
        m = (pos2 >= l0) & (pos2 < l0 + 40)
        cur = o_ref[0, pl.ds(r0, 2), :]
        o_ref[0, pl.ds(r0, 2), :] = jnp.where(m, val, cur)
        return c
    lax.fori_loop(0, iters, body, jnp.int32(0))

def mstore(x, iters):
    k = functools.partial(mkernel, iters=iters)
    return pl.pallas_call(
        k, grid=(N,),
        in_specs=[pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, NROWS, LANES), jnp.int32),
    )(x)

timeit("masked 2-row RMW store x1024", jax.jit(functools.partial(mstore, iters=1024)), x)
