"""Floor probe: where does the empty-kernel time go?
Measures (a) per-launch, (b) per-block (grid step), (c) per-chunk cost,
plus CB=8 amortization, by running the -all ablation with synthetic
p_used vectors."""
import sys, os, time, functools
sys.path.insert(0, '/root/repo')
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

def make_kernel(comp_rows, out_rows, mt_max, CB):
    DCHUNK = CB
    def kernel(p_used_ref, p_off_ref, p0_ref, bands_ref, se_ref, shift_ref,
               comp_ref, out_ref, comp_sc, out_sc):
        nrows = out_rows
        b = pl.program_id(0)
        npass = p_used_ref[b]
        ncomp = p0_ref[b]
        base = p_off_ref[b]
        comp_i8 = comp_ref[0]
        comp_sc[:, 0:LANES] = comp_i8
        comp_sc[:, LANES:] = jnp.roll(comp_i8, -1, axis=0)
        MT = min(nrows, mt_max)

        def one_pass_tile(j, src_ref, mt, band):
            active = jnp.ones((MT, LANES), jnp.bool_)
            val = jnp.full((MT, LANES), j, jnp.int8)
            return active, val

        def comp_chunk(c, _):
            for mt in range(0, nrows, MT):
                cur = out_sc[mt:mt + MT, 0:LANES]
                for j in range(CB):
                    a_j, v_j = one_pass_tile(j, comp_sc, mt, 0)
                    cur = jnp.where(a_j, v_j, cur)
                out_sc[mt:mt + MT, 0:LANES] = cur
            return 0

        def out_chunk(c, _):
            for j in range(CB):
                for mt in range(0, nrows, MT):
                    a, v = one_pass_tile(j, out_sc, mt, 0)
                    cur = out_sc[mt:mt + MT, 0:LANES]
                    out_sc[mt:mt + MT, 0:LANES] = jnp.where(a, v, cur)
            return 0

        nchunks = npass // DCHUNK
        ncomp_chunks = ncomp // DCHUNK
        lax.fori_loop(0, ncomp_chunks, comp_chunk, 0)
        out_sc[:, LANES:] = jnp.roll(out_sc[:, 0:LANES], -1, axis=0)
        lax.fori_loop(ncomp_chunks, nchunks, out_chunk, 0)
        out_ref[0] = (out_sc[:, 0:LANES].astype(jnp.int32) + 128).astype(jnp.uint8)
    return kernel

@functools.partial(jax.jit, static_argnames=("comp_rows", "out_rows", "mt_max", "CB"))
def decode_abl(comp, p_used, p_off, p0, se_flat, shift_flat, bands, *,
               comp_rows, out_rows, mt_max, CB):
    n = comp.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(se_flat.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(shift_flat.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, comp_rows, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((comp_rows, 2 * LANES), jnp.int8),
            pltpu.VMEM((out_rows, 2 * LANES), jnp.int8),
        ],
    )
    kernel = make_kernel(comp_rows, out_rows, mt_max, CB)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_rows, 128), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(p_used, p_off, p0, bands, se_flat, shift_flat, comp)

NROWS = 1024
COMP_ROWS = 1280
NBLOCKS = 64
S = 512
rng = np.random.default_rng(0)
comp = jnp.asarray(rng.integers(-128, 128, (NBLOCKS, COMP_ROWS, 128), np.int8))
se = jnp.zeros((S, NROWS // 128, 128), jnp.int16)
shf = jnp.zeros((S, NROWS // 128, 128), jnp.int32)
bands = jnp.zeros(S * 8, jnp.int32)

def run(tag, npass, ncomp, CB, mt_max=512):
    p_used = jnp.full(NBLOCKS, npass, jnp.int32)
    p0v = jnp.full(NBLOCKS, ncomp, jnp.int32)
    p_off = jnp.zeros(NBLOCKS, jnp.int32)
    kw = dict(comp_rows=COMP_ROWS, out_rows=NROWS, mt_max=mt_max, CB=CB)
    r = decode_abl(comp, p_used, p_off, p0v, se, shf, bands, **kw)
    np.asarray(r[0, 0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        REPS = 16
        for _ in range(REPS):
            r = decode_abl(comp, p_used, p_off, p0v, se, shf, bands, **kw)
        np.asarray(r[:, -1, -1])
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{tag}: {best*1e3:.3f} ms/launch "
          f"({best*1e6/NBLOCKS:.2f} us/block)", flush=True)

run("0 passes          CB4", 0, 0, 4)
run("4 passes (1 comp chunk) CB4", 4, 4, 4)
run("16 passes (4 comp chunks) CB4", 16, 16, 4)
run("32 passes (8 comp chunks) CB4", 32, 32, 4)
run("32 passes (4+4 chunks) CB4", 32, 16, 4)
run("32 passes CB8", 32, 32, 8)
run("32 passes CB16", 32, 32, 16)
run("32 passes CB4 mt1024", 32, 32, 4, 1024)
