# Ablations of the current (v3 tiled) flat kernel on the bench corpus.
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import bitar_tpu as bt
from bitar_tpu.ops.pallas.lz4_decode_flat import LANES, CB, DCHUNK, bias_planes

BLOCK = 128 * 1024
NBLOCKS = 64
NROWS = BLOCK // 128

def make_corpus(nblocks):
    rng = np.random.default_rng(2026)
    parts = []
    for i in range(nblocks):
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
    return b"".join(parts)

data = make_corpus(NBLOCKS)
cfg = bt.EngineConfig(codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=NBLOCKS,
                      max_pool_slots=NBLOCKS + 32, use_tpu_kernels=True)
eng = bt.Engine(cfg).initialize()
unit = eng.compress(data)
eng.ensure_plans(unit)
plans = unit.plan_flat
comp_rows = unit.plan_comp_rows
S = int(plans["p_used"].sum())
print(f"S={S}", file=sys.stderr)
rows_dev = eng.arena.gather_burst([r.slot for r in unit.refs])
planes = bias_planes(rows_dev, comp_rows)

def make_kernel(ablate):
    def _k(p_used_ref, p_off_ref, p0_ref, se_ref, shift_ref, comp_ref,
           out_ref, comp_sc, out_sc, se_buf, shift_buf, sems, *,
           comp_rows, out_rows):
        nrows = out_rows
        b = pl.program_id(0)
        npass = p_used_ref[b]
        ncomp = p0_ref[b]
        base = p_off_ref[b]
        comp_i8 = comp_ref[0]
        comp_sc[:, 0:LANES] = comp_i8
        comp_sc[:, LANES:] = jnp.roll(comp_i8, -1, axis=0)
        MT = min(nrows, 1024)
        KC = 1024
        lane_iota = lax.broadcasted_iota(jnp.int32, (MT, LANES), 1)
        row_iota = lax.broadcasted_iota(jnp.int32, (MT, LANES), 0)
        def fetch(chunk, slot):
            row = base + chunk * DCHUNK
            pltpu.make_async_copy(se_ref.at[pl.ds(row, DCHUNK)],
                                  se_buf.at[pl.ds(slot * DCHUNK, DCHUNK)], sems.at[0, slot]).start()
            pltpu.make_async_copy(shift_ref.at[pl.ds(row, DCHUNK)],
                                  shift_buf.at[pl.ds(slot * DCHUNK, DCHUNK)], sems.at[1, slot]).start()
        def wait_slot(slot):
            pltpu.make_async_copy(se_ref.at[pl.ds(0, DCHUNK)],
                                  se_buf.at[pl.ds(slot * DCHUNK, DCHUNK)], sems.at[0, slot]).wait()
            pltpu.make_async_copy(shift_ref.at[pl.ds(0, DCHUNK)],
                                  shift_buf.at[pl.ds(slot * DCHUNK, DCHUNK)], sems.at[1, slot]).wait()
        kiota = lax.broadcasted_iota(jnp.int32, (MT, KC), 1)
        def one_pass_tile(slot_idx, src_ref, mt):
            krows = src_ref.shape[0]
            t0 = mt // LANES
            nt = MT // LANES
            if ablate == "norowcast":
                se = jnp.zeros((MT, LANES), jnp.int32) + 128
                shift = jnp.zeros((MT, LANES), jnp.int32)
            else:
                tt = se_buf[pl.ds(slot_idx, 1)][0][t0:t0 + nt].astype(jnp.int32)
                vt = tt.T
                se = jnp.concatenate([jnp.broadcast_to(vt[:, a:a+1], (LANES, LANES)) for a in range(nt)], axis=0)
                tt2 = shift_buf[pl.ds(slot_idx, 1)][0][t0:t0 + nt]
                vt2 = tt2.T
                shift = jnp.concatenate([jnp.broadcast_to(vt2[:, a:a+1], (LANES, LANES)) for a in range(nt)], axis=0)
            start = lax.shift_right_logical(se, 8)
            end = lax.bitwise_and(se, 0xFF)
            active = jnp.logical_and(lane_iota >= start, lane_iota < end)
            byte_iota = (row_iota + mt) * LANES + lane_iota
            q = byte_iota + shift
            qrow = lax.shift_right_logical(q, 7)
            qlane = lax.bitwise_and(q, LANES - 1)
            row_a_full = lax.shift_right_logical(jnp.maximum(start + byte_iota - lane_iota + shift, 0), 7)
            row_a = jnp.minimum(row_a_full[:, 0:1], krows - 1)
            if ablate == "nogather":
                return active, (row_a + qlane).astype(jnp.int8)
            acc = jnp.zeros((MT, 2 * LANES), jnp.int32)
            for ck in range(0, krows, KC):
                kc = min(KC, krows - ck)
                oh = (kiota[:, :kc] == (row_a - ck)).astype(jnp.int8)
                acc = acc + jnp.dot(oh, src_ref[ck:ck + kc, :], preferred_element_type=jnp.int32)
            if ablate == "noshuffle":
                return active, acc[:, :LANES].astype(jnp.int8)
            v_a = jnp.take_along_axis(acc[:, :LANES], qlane, axis=1)
            v_b = jnp.take_along_axis(acc[:, LANES:], qlane, axis=1)
            val = jnp.where(qrow == row_a, v_a, v_b)
            return active, val.astype(jnp.int8)
        def stage_plans(c, slot):
            if ablate != "nodma":
                @pl.when(c + 1 < nchunks)
                def _():
                    fetch(c + 1, 1 - slot)
                wait_slot(slot)
        def comp_chunk(c, _):
            slot = lax.rem(c, 2)
            stage_plans(c, slot)
            for mt in range(0, nrows, MT):
                cur = out_sc[mt:mt + MT, 0:LANES]
                for j in range(CB):
                    a_j, v_j = one_pass_tile(slot * DCHUNK + j, comp_sc, mt)
                    cur = jnp.where(a_j, v_j, cur)
                if ablate != "nostore":
                    out_sc[mt:mt + MT, 0:LANES] = cur
            return 0
        def out_chunk(c, _):
            slot = lax.rem(c, 2)
            stage_plans(c, slot)
            for j in range(CB):
                for mt in range(0, nrows, MT):
                    a, v = one_pass_tile(slot * DCHUNK + j, out_sc, mt)
                    cur = out_sc[mt:mt + MT, 0:LANES]
                    if ablate != "nostore":
                        out_sc[mt:mt + MT, 0:LANES] = jnp.where(a, v, cur)
                if ablate not in ("nostore", "noroll"):
                    out_sc[:, LANES:] = jnp.roll(out_sc[:, 0:LANES], -1, axis=0)
            return 0
        nchunks = npass // DCHUNK
        ncomp_chunks = ncomp // DCHUNK
        if ablate != "nodma":
            fetch(0, 0)
        lax.fori_loop(0, ncomp_chunks, comp_chunk, 0)
        out_sc[:, LANES:] = jnp.roll(out_sc[:, 0:LANES], -1, axis=0)
        lax.fori_loop(ncomp_chunks, nchunks, out_chunk, 0)
        out_ref[0] = (out_sc[:, 0:LANES].astype(jnp.int32) + 128).astype(jnp.uint8)

    tiles = NROWS // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(NBLOCKS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM), pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((1, comp_rows, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NROWS, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((comp_rows, 2 * LANES), jnp.int8),
                        pltpu.VMEM((NROWS, 2 * LANES), jnp.int8),
                        pltpu.VMEM((2 * DCHUNK, tiles, LANES), jnp.int16),
                        pltpu.VMEM((2 * DCHUNK, tiles, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )
    kern = functools.partial(_k, comp_rows=comp_rows, out_rows=NROWS)
    return pl.pallas_call(kern, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((NBLOCKS, NROWS, 128), jnp.uint8),
                          compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024))

args = (jnp.asarray(plans["p_used"]), jnp.asarray(plans["p_off"]), jnp.asarray(plans["p0"]),
        jnp.asarray(plans["se"]), jnp.asarray(plans["shift"]), planes)

for abl in ("full", "nostore", "noroll", "nodma", "norowcast", "nogather", "noshuffle"):
    try:
        f = make_kernel(abl)
        o = f(*args); np.asarray(o[0, 0, :1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(8):
                last = f(*args)
            np.asarray(last[0, 0, :1])
            best = min(best, (time.perf_counter() - t0) / 8)
        print(f"{abl}: {best*1e3:.2f} ms  ({best/S*1e6:.1f} us/pass)")
    except Exception as e:
        print(f"{abl}: FAILED {str(e)[:160]}")
eng.recycle(unit); eng.release()
