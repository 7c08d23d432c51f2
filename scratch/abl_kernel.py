"""Ablation copy of the flat kernel: switches cut stages to price them.
stages: gather, take, colcast, iota, store  (cut = replace with cheap stub)
"""
import sys, os, time, functools
sys.path.insert(0, '/root/repo')
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bitar_tpu.ops.cpu import native
import bitar_tpu.ops.pallas.lz4_decode_flat as F

LANES = 128
CB = 4
DCHUNK = CB
KBAND = 256

def _colcast(vt, t0, nt):
    cols = [jnp.broadcast_to(vt[:, t0 + a:t0 + a + 1], (LANES, LANES))
            for a in range(nt)]
    return jnp.concatenate(cols, axis=0) if nt > 1 else cols[0]

def make_kernel(comp_rows, out_rows, mt_max, cuts):
    cut = lambda s: s in cuts
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
        lane_iota = lax.broadcasted_iota(jnp.int32, (MT, LANES), 1)
        row_iota = lax.broadcasted_iota(jnp.int32, (MT, LANES), 0)
        tiles = nrows // LANES
        mtiles = nrows // MT

        def one_pass_tile(tv, src_ref, mt, band):
            krows = src_ref.shape[0]
            t0 = mt // LANES
            nt = MT // LANES
            vt_se, vt_sh, j = tv
            if cut('colcast'):
                se = jnp.full((MT, LANES), 0x0080, jnp.int32)
                shift = jnp.zeros((MT, LANES), jnp.int32)
            else:
                se = _colcast(vt_se, j * tiles + t0, nt)
                shift = _colcast(vt_sh, j * tiles + t0, nt)
            start = lax.shift_right_logical(se, 8)
            end = lax.bitwise_and(se, 0xFF)
            active = jnp.logical_and(lane_iota >= start, lane_iota < end)
            byte_iota = (row_iota + mt) * LANES + lane_iota
            q = byte_iota + shift
            qrow = lax.shift_right_logical(q, 7)
            qlane = lax.bitwise_and(q, LANES - 1)
            row_a_full = lax.shift_right_logical(
                jnp.maximum(start + byte_iota - lane_iota + shift, 0), 7)
            row_a = jnp.minimum(row_a_full[:, 0:1], krows - 1)
            KB = min(KBAND, krows)
            if cut('gather'):
                acc = jnp.zeros((MT, 2 * LANES), jnp.int32)
            else:
                kiota_b = lax.broadcasted_iota(jnp.int32, (MT, KB), 1)
                b0 = lax.shift_right_logical(band, 8)
                oh = (kiota_b == (row_a - b0)).astype(jnp.int8)
                src = src_ref[pl.ds(pl.multiple_of(b0, 8), KB), :]
                acc = jnp.dot(oh, src, preferred_element_type=jnp.int32)
            if cut('take'):
                val = acc[:, :LANES]
            else:
                v_a = jnp.take_along_axis(acc[:, :LANES], qlane, axis=1)
                v_b = jnp.take_along_axis(acc[:, LANES:], qlane, axis=1)
                val = jnp.where(qrow == row_a, v_a, v_b)
            return active, val.astype(jnp.int8)

        def band_of(c, j, mt):
            prow = base + c * DCHUNK + j
            return bands_ref[prow * mtiles + mt // MT]

        def chunk_values(c):
            if cut('chunkvals'):
                return (jnp.zeros((LANES, DCHUNK * tiles), jnp.int32),
                        jnp.zeros((LANES, DCHUNK * tiles), jnp.int32))
            tt = se_ref[pl.ds(base + c * DCHUNK, DCHUNK)].astype(jnp.int32)
            tt2 = shift_ref[pl.ds(base + c * DCHUNK, DCHUNK)]
            vt_se = tt.reshape(DCHUNK * tiles, LANES).T
            vt_sh = tt2.reshape(DCHUNK * tiles, LANES).T
            return vt_se, vt_sh

        def comp_chunk(c, _):
            vt_se, vt_sh = chunk_values(c)
            for mt in range(0, nrows, MT):
                cur = out_sc[mt:mt + MT, 0:LANES]
                for j in range(CB):
                    a_j, v_j = one_pass_tile((vt_se, vt_sh, j), comp_sc, mt,
                                             band_of(c, j, mt))
                    cur = jnp.where(a_j, v_j, cur)
                out_sc[mt:mt + MT, 0:LANES] = cur
            return 0

        def out_chunk(c, _):
            vt_se, vt_sh = chunk_values(c)
            for j in range(CB):
                for mt in range(0, nrows, MT):
                    a, v = one_pass_tile((vt_se, vt_sh, j), out_sc, mt,
                                         band_of(c, j, mt))
                    cur = out_sc[mt:mt + MT, 0:LANES]
                    out_sc[mt:mt + MT, 0:LANES] = jnp.where(a, v, cur)
                if not cut('mirror'):
                    out_sc[:, LANES:] = jnp.roll(out_sc[:, 0:LANES], -1, axis=0)
            return 0

        nchunks = npass // DCHUNK
        ncomp_chunks = ncomp // DCHUNK
        lax.fori_loop(0, ncomp_chunks, comp_chunk, 0)
        out_sc[:, LANES:] = jnp.roll(out_sc[:, 0:LANES], -1, axis=0)
        lax.fori_loop(ncomp_chunks, nchunks, out_chunk, 0)
        out_ref[0] = (out_sc[:, 0:LANES].astype(jnp.int32) + 128).astype(jnp.uint8)
    return kernel

@functools.partial(jax.jit, static_argnames=("comp_rows", "out_rows", "mt_max", "cuts"))
def decode_abl(comp, p_used, p_off, p0, se_flat, shift_flat, bands, *,
               comp_rows, out_rows, mt_max, cuts=()):
    n = comp.shape[0]
    tiles = out_rows // LANES
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
    kernel = make_kernel(comp_rows, out_rows, mt_max, frozenset(cuts))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_rows, 128), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(p_used, p_off, p0, bands, se_flat, shift_flat, comp)


BLOCK = 128 * 1024
NROWS = BLOCK // 128
NBLOCKS = 64
rng = np.random.default_rng(2026)
parts = []
for i in range(NBLOCKS):
    k = i % 4
    if k == 0:
        p = (b"The quick brown fox jumps over the lazy dog %d. " % i) * (BLOCK // 47 + 1)
    elif k == 1:
        p = rng.integers(0, 16, BLOCK, dtype=np.uint8).tobytes()
    elif k == 2:
        p = rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes()
    else:
        p = bytes([i & 0xFF]) * BLOCK
    parts.append(p[:BLOCK])
comps = [np.asarray(native.lz4_compress(p)) for p in parts]
src = np.concatenate(comps)
lens = np.array([len(c) for c in comps], np.int32)
off = np.zeros(NBLOCKS, np.int64); off[1:] = np.cumsum(lens[:-1])
out_len = np.full(NBLOCKS, BLOCK, np.int32)
ids = np.zeros(NBLOCKS, np.int32)
comp_rows = -(-int(lens.max()) // 128)
comp_rows = -(-comp_rows // 128) * 128
comp_rows = -(-comp_rows // KBAND) * KBAND
cp = np.zeros((NBLOCKS, comp_rows * 128), np.uint8)
for i, c in enumerate(comps):
    cp[i, :len(c)] = c
planes = F.bias_planes(jnp.asarray(cp), comp_rows)
raw = np.frombuffer(b"".join(parts), np.uint8).reshape(NBLOCKS, NROWS, 128)

MT = 512
se, sh, pu, p0, st, _ = native.plan_batch_flat(
    src, off, lens, out_len, ids, NROWS, 160, cb=4,
    band_rows=256, band_tile=MT)
assert (st == 0).all()
plans = F.flatten_batch_plans(se, sh, pu, p0, NROWS)
bands = jnp.asarray(F.compute_bands(plans, comp_rows, NROWS, mt_max=MT))
args = (planes, jnp.asarray(plans["p_used"]), jnp.asarray(plans["p_off"]),
        jnp.asarray(plans["p0"]), jnp.asarray(plans["se"]),
        jnp.asarray(plans["shift"]), bands)

def run(tag, cuts):
    kw = dict(comp_rows=comp_rows, out_rows=NROWS, mt_max=MT,
              cuts=tuple(sorted(cuts)))
    t0 = time.perf_counter()
    r = decode_abl(*args, **kw)
    got = np.asarray(r)
    ok = bool((got == raw).all()) if not cuts else None
    print(f"{tag}: compile {time.perf_counter()-t0:.1f}s exact={ok}", flush=True)
    best = 1e9
    for trial in range(2):
        t0 = time.perf_counter()
        REPS = 8
        for _ in range(REPS):
            r = decode_abl(*args, **kw)
        np.asarray(r[:, -1, -1])
        dt = (time.perf_counter() - t0) / REPS
        best = min(best, dt)
    print(f"{tag}: {best*1e3:.2f} ms ({NBLOCKS*BLOCK/best/1e9:.3f} GB/s, "
          f"{best*1e6/pu.sum():.2f} us/pass)", flush=True)

run("none (full)", ())
run("-gather", ("gather",))
run("-take", ("take",))
run("-colcast", ("colcast",))
run("-chunkvals", ("chunkvals",))
run("-mirror", ("mirror",))
run("-gather-take", ("gather", "take"))
run("-all", ("gather", "take", "colcast", "chunkvals", "mirror"))
