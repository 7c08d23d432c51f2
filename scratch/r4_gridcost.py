"""Isolate per-grid-step overhead: outputs, scalar prefetch, dtype."""
import sys, time, functools
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NROWS, LANES, N = 1024, 128, 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 256, (N, NROWS, LANES), np.uint8))
noff = jnp.asarray(np.full(N, 1, np.int32))
offs = jnp.asarray(np.full((N, 4), 3008, np.int32))

def bench(name, f, *args):
    r = f(*args); np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(6):
            r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        best = min(best, (time.perf_counter()-t0)/6)
    print(f"{name:36s}: {best*1e3:7.2f} ms / {N} blocks", flush=True)

# (a) trivial: one uint8 out, no prefetch
def k_a(x_ref, o_ref):
    o_ref[0] = x_ref[0]
f_a = jax.jit(pl.pallas_call(k_a, grid=(N,),
    in_specs=[pl.BlockSpec((1, NROWS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, NROWS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((N, NROWS, 128), jnp.uint8)))
bench("copy u8", f_a, x)

# (b) one int32 out (cast)
def k_b(x_ref, o_ref):
    o_ref[0] = x_ref[0].astype(jnp.int32)
f_b = jax.jit(pl.pallas_call(k_b, grid=(N,),
    in_specs=[pl.BlockSpec((1, NROWS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, NROWS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((N, NROWS, 128), jnp.int32)))
bench("cast i32 out", f_b, x)

# (c) two int32 outs
def k_c(x_ref, o1, o2):
    v = x_ref[0].astype(jnp.int32)
    o1[0] = v
    o2[0] = v + 1
f_c = jax.jit(pl.pallas_call(k_c, grid=(N,),
    in_specs=[pl.BlockSpec((1, NROWS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=(pl.BlockSpec((1, NROWS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
               pl.BlockSpec((1, NROWS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)),
    out_shape=(jax.ShapeDtypeStruct((N, NROWS, 128), jnp.int32),
               jax.ShapeDtypeStruct((N, NROWS, 128), jnp.int32))))
bench("two i32 outs", f_c, x)

# (d) two i32 outs + scalar prefetch + fori body with pl.when
def k_d(noff_ref, offs_ref, x_ref, o1, o2):
    b = pl.program_id(0)
    v = x_ref[0].astype(jnp.int32)
    o1[0] = jnp.zeros((NROWS, LANES), jnp.int32)
    o2[0] = jnp.zeros((NROWS, LANES), jnp.int32)
    @pl.when(noff_ref[b] > 0)
    def _():
        def body(ki, _):
            o1[0] = jnp.maximum(o1[0], v + offs_ref[b, ki])
            return 0
        lax.fori_loop(0, noff_ref[b], body, 0)
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2, grid=(N,),
    in_specs=[pl.BlockSpec((1, NROWS, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=(pl.BlockSpec((1, NROWS, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
               pl.BlockSpec((1, NROWS, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)))
f_d = jax.jit(pl.pallas_call(k_d, grid_spec=gs,
    out_shape=(jax.ShapeDtypeStruct((N, NROWS, 128), jnp.int32),
               jax.ShapeDtypeStruct((N, NROWS, 128), jnp.int32))))
bench("prefetch + fori + 2 i32 outs", f_d, noff, offs, x)

# (e) like (d) but output written unconditionally (no zero-init then when)
def k_e(noff_ref, offs_ref, x_ref, o1, o2):
    b = pl.program_id(0)
    v = x_ref[0].astype(jnp.int32)
    o1[0] = v + noff_ref[b]
    o2[0] = v
f_e = jax.jit(pl.pallas_call(k_e, grid_spec=gs,
    out_shape=(jax.ShapeDtypeStruct((N, NROWS, 128), jnp.int32),
               jax.ShapeDtypeStruct((N, NROWS, 128), jnp.int32))))
bench("prefetch, no fori", f_e, noff, offs, x)
