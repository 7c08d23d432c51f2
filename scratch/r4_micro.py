"""Round-4 micro-benchmarks: plane-op dtype cost + matcher design probes."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

NROWS, LANES, N = 1024, 128, 64

def timeit(name, fn, *a, reps=8):
    r = fn(*a); np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        best = min(best, (time.perf_counter()-t0)/reps)
    print(f"{name:28s}: {best*1e6:9.1f} us")
    return best

# --- 1. elementwise plane ops: int32 vs int8, 64 iterations in-kernel
def ew_kernel(x_ref, o_ref, *, dtype, iters):
    v = x_ref[0].astype(dtype)
    one = jnp.ones((), dtype)
    for i in range(iters):
        v = jnp.minimum(v + one, jnp.maximum(v - one, v))
    o_ref[0] = v.astype(jnp.int8)

def ew(x, dtype, iters):
    k = functools.partial(ew_kernel, dtype=dtype, iters=iters)
    return pl.pallas_call(
        k, grid=(N,),
        in_specs=[pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, NROWS, LANES), jnp.int8),
    )(x)

x = jnp.asarray(np.random.default_rng(0).integers(0, 100, (N, NROWS, LANES), np.int8))
ew32 = jax.jit(functools.partial(ew, dtype=jnp.int32, iters=64))
t32 = timeit("elementwise int32 x64", ew32, x)

# --- 2. lane roll cost by dtype
def roll_kernel(x_ref, o_ref, *, dtype, iters):
    v = x_ref[0].astype(dtype)
    acc = v
    for i in range(iters):
        acc = acc + pltpu.roll(v, 1 + (i % 7), axis=1)
    o_ref[0] = acc.astype(jnp.int8)

def rollb(x, dtype, iters):
    k = functools.partial(roll_kernel, dtype=dtype, iters=iters)
    return pl.pallas_call(
        k, grid=(N,),
        in_specs=[pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, NROWS, LANES), jnp.int8),
    )(x)

timeit("lane-roll int32 x32", jax.jit(functools.partial(rollb, dtype=jnp.int32, iters=32)), x)

# --- 3. in-row reverse cummax via lane rolls (7 steps), int32
def scan_kernel(x_ref, o_ref, *, iters):
    v = x_ref[0].astype(jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, (NROWS, LANES), 1)
    for _ in range(iters):
        acc = v
        s = 1
        while s < LANES:
            r = pltpu.roll(acc, LANES - s, axis=1)   # acc[j+s]
            acc = jnp.where(lane < LANES - s, jnp.maximum(acc, r), acc)
            s *= 2
        v = acc - 1
    o_ref[0] = v.astype(jnp.int8)

def scanb(x, iters):
    k = functools.partial(scan_kernel, iters=iters)
    return pl.pallas_call(
        k, grid=(N,),
        in_specs=[pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NROWS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, NROWS, LANES), jnp.int8),
    )(x)

ts = timeit("inrow-revscan int32 x8", jax.jit(functools.partial(scanb, iters=8)), x)
print(f"  -> per scan: {ts/8*1e6:.1f} us/block-scan (x{N} blocks)")
