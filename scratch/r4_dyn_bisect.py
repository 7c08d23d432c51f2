"""Bisect dynamic-matcher kernel cost: decomp-roll vs doubling vs loop."""
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

def mk(variant):
    def kern(noff_ref, offs_ref, comp_ref, len_ref, *, variant):
        b = pl.program_id(0)
        plane = comp_ref[0].astype(jnp.int32)
        lane = lax.broadcasted_iota(jnp.int32, (NROWS, LANES), 1)
        len_ref[0] = jnp.zeros((NROWS, LANES), jnp.int32)

        def shift_fwd(p, d):
            q, r = divmod(d, LANES)
            a = pltpu.roll(p, (NROWS - q) % NROWS, axis=0)
            if r == 0:
                return a
            bb = pltpu.roll(p, (NROWS - q - 1) % NROWS, axis=0)
            a = pltpu.roll(a, LANES - r, axis=1)
            bb = pltpu.roll(bb, LANES - r, axis=1)
            return jnp.where(lane < LANES - r, a, bb)

        def body(ki, _):
            d = offs_ref[b, ki]
            v = plane
            if variant in ("decomp", "full"):
                q = d // LANES
                for bit in range(10):
                    amt = 1 << bit
                    rolled = pltpu.roll(v, amt, axis=0)
                    v = jnp.where(lax.bitwise_and(q, amt) != 0, rolled, v)
            if variant in ("dbl", "full"):
                run = (v == plane).astype(jnp.int32)
                step = 1
                while step < 512:
                    nxt = shift_fwd(run, step)
                    run = jnp.where(run == step, run + nxt, run)
                    step *= 2
                v = run
            len_ref[0] = jnp.maximum(len_ref[0], v)
            return 0
        lax.fori_loop(0, noff_ref[b], body, 0)

    k = functools.partial(kern, variant=variant)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(N,),
        in_specs=[pl.BlockSpec((1, NROWS, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NROWS, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM))
    f = pl.pallas_call(k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((N, NROWS, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))
    return jax.jit(lambda a, b, c: f(a, b, c))

for variant in ("none", "decomp", "dbl", "full"):
    f = mk(variant)
    r = f(noff, offs, x); np.asarray(r.reshape(-1)[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            r = f(noff, offs, x)
        np.asarray(r.reshape(-1)[:1])
        best = min(best, (time.perf_counter()-t0)/4)
    print(f"{variant:8s}: {best*1e3:7.2f} ms / {N} blocks", flush=True)
