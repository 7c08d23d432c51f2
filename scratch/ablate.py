# Ablation study of the flat kernel's per-pass cost on the bench corpus.
# Each variant removes one piece (results wrong; timing valid).
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import bitar_tpu as bt
from bitar_tpu.ops.pallas.lz4_decode_flat import build_flat_plans, LANES, KCHUNK, CB, DCHUNK
from bitar_tpu.ops.cpu import native
from bitar_tpu.config import Codec
from bitar_tpu.manifest import codec_from_id

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
comp_rows = unit.plan_comp_rows
rows = np.asarray(eng.arena.gather_burst([r.slot for r in unit.refs]))
planes_np = rows[:, :comp_rows * 128].reshape(NBLOCKS, comp_rows, 128)
m = unit.manifest
raw_plans = []
for i in range(NBLOCKS):
    codec = codec_from_id(int(m.codec_ids[i]))
    comp_b = planes_np[i].reshape(-1)[:int(m.comp_len[i])]
    if codec == Codec.RAW:
        cols = {k: np.zeros((1, NROWS), np.int32) for k in ("r_dstart", "r_dend", "r_shift")}
        rl = int(m.raw_len[i]); ru = -(-rl // 128)
        cols["r_dend"][0, :ru] = np.minimum(rl, (np.arange(ru) + 1) * 128)
        raw_plans.append((1, 1, cols))
    else:
        native.set_split_limit(8)
        P, p0, cols = native.plan_block(comp_b, int(m.raw_len[i]), NROWS, max_passes=96, codec="lz4")
        raw_plans.append((P, p0, cols))
plans = build_flat_plans(raw_plans, comp_rows, NROWS)
S = int(plans["p_used"].sum())
print(f"S={S} passes total", file=sys.stderr)

def make_kernel(ablate):
    def _k(p_used_ref, p_off_ref, p0_ref, rlo_ref, rhi_ref,
           se_ref, shift_ref, comp_ref, out_ref, s2_ref, se_buf, shift_buf, sems,
           *, comp_rows, out_rows):
        nrows = out_rows
        w_rows = s2_ref.shape[0]
        b = pl.program_id(0)
        npass = p_used_ref[b]
        base = p_off_ref[b]
        comp_i8 = (comp_ref[0].astype(jnp.int32) - 128).astype(jnp.int8)
        s2_ref[0:comp_rows, 0:LANES] = comp_i8
        s2_ref[comp_rows:, 0:LANES] = jnp.full((w_rows - comp_rows, LANES), -128, jnp.int8)
        s2_ref[0:comp_rows - 1, LANES:] = comp_i8[1:comp_rows]
        s2_ref[comp_rows - 1:, LANES:] = jnp.full((w_rows - comp_rows + 1, LANES), -128, jnp.int8)
        lane_iota = lax.broadcasted_iota(jnp.int32, (nrows, LANES), 1)
        byte_iota = lax.broadcasted_iota(jnp.int32, (nrows, LANES), 0) * LANES + lane_iota

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

        def one_pass(k, slot_idx):
            if ablate == "empty":
                return jnp.zeros((nrows, LANES), jnp.bool_), jnp.zeros((nrows, LANES), jnp.int8)
            if ablate == "norowcast":
                se = jnp.broadcast_to(se_buf[0, 0:1, 0:1].astype(jnp.int32), (nrows, LANES))
                shift = jnp.broadcast_to(shift_buf[0, 0:1, 0:1], (nrows, LANES))
            else:
                t = se_buf[pl.ds(slot_idx, 1)][0].astype(jnp.int32)
                vt = t.T
                se = jnp.concatenate([jnp.broadcast_to(vt[:, a:a+1], (LANES, LANES)) for a in range(t.shape[0])], axis=0)
                t2 = shift_buf[pl.ds(slot_idx, 1)][0]
                vt2 = t2.T
                shift = jnp.concatenate([jnp.broadcast_to(vt2[:, a:a+1], (LANES, LANES)) for a in range(t2.shape[0])], axis=0)
            start = lax.shift_right_logical(se, 8)
            end = lax.bitwise_and(se, 0xFF)
            active = jnp.logical_and(lane_iota >= start, lane_iota < end)
            q = byte_iota + shift
            qrow = lax.shift_right_logical(q, 7)
            qlane = lax.bitwise_and(q, LANES - 1)
            row_a_full = lax.shift_right_logical(jnp.maximum(start + byte_iota - lane_iota + shift, 0), 7)
            row_a = jnp.minimum(row_a_full[:, 0:1], w_rows - 1)
            rlo = rlo_ref[base + k]
            rhi = rhi_ref[base + k]
            acc = jnp.zeros((nrows, 2 * LANES), jnp.int32)
            if ablate != "nomatmul":
                for ck in range(0, w_rows, KCHUNK):
                    hit = jnp.logical_and(rhi >= ck, rlo < ck + KCHUNK)
                    def mul(a, ck=ck):
                        kiota = lax.broadcasted_iota(jnp.int32, (nrows, KCHUNK), 1)
                        oh = (kiota == (row_a - ck)).astype(jnp.int8)
                        return a + jnp.dot(oh, s2_ref[ck:ck + KCHUNK, :], preferred_element_type=jnp.int32)
                    if ablate == "nocond":
                        acc = mul(acc)
                    else:
                        acc = lax.cond(hit, mul, lambda a: a, acc)
            if ablate == "noshuffle":
                val = acc[:, :LANES]
            else:
                v_a = jnp.take_along_axis(acc[:, :LANES], qlane, axis=1)
                v_b = jnp.take_along_axis(acc[:, LANES:], qlane, axis=1)
                val = jnp.where(qrow == row_a, v_a, v_b)
            return active, val.astype(jnp.int8)

        ncomp = p0_ref[b]
        def comp_batch(c, half):
            k0 = c * DCHUNK + half * CB
            slot = lax.rem(c, 2) * DCHUNK + half * CB
            cur = s2_ref[comp_rows:comp_rows + nrows, 0:LANES]
            for j in range(CB):
                a_j, v_j = one_pass(k0 + j, slot + j)
                cur = jnp.where(a_j, v_j, cur)
            if ablate != "nostore":
                s2_ref[comp_rows:comp_rows + nrows, 0:LANES] = cur
        def out_pass(k, slot_idx):
            a, v = one_pass(k, slot_idx)
            cur = s2_ref[comp_rows:comp_rows + nrows, 0:LANES]
            new = jnp.where(a, v, cur)
            if ablate != "nostore":
                s2_ref[comp_rows:comp_rows + nrows, 0:LANES] = new
                s2_ref[comp_rows - 1:comp_rows + nrows - 1, LANES:] = new
        nchunks = (npass + DCHUNK - 1) // DCHUNK
        def chunk_body(c, _):
            slot = lax.rem(c, 2)
            @pl.when(c + 1 < nchunks)
            def _():
                fetch(c + 1, 1 - slot)
            wait_slot(slot)
            for half in range(DCHUNK // CB):
                k0 = c * DCHUNK + half * CB
                @pl.when(k0 + CB <= ncomp)
                def _(c=c, half=half):
                    comp_batch(c, half)
                @pl.when(jnp.logical_and(k0 >= ncomp, k0 < npass))
                def _(c=c, half=half, k0=k0, slot=slot):
                    @pl.when(k0 == ncomp)
                    def _():
                        s2_ref[comp_rows - 1:comp_rows + nrows - 1, LANES:] = \
                            s2_ref[comp_rows:comp_rows + nrows, 0:LANES]
                    for j in range(CB):
                        out_pass(k0 + j, slot * DCHUNK + half * CB + j)
            return 0
        fetch(0, 0)
        lax.fori_loop(0, nchunks, chunk_body, 0)
        out_ref[0] = (s2_ref[comp_rows:comp_rows + nrows, 0:LANES].astype(jnp.int32) + 128).astype(jnp.uint8)

    tiles = NROWS // LANES
    w_rows = -(-(comp_rows + NROWS) // KCHUNK) * KCHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5, grid=(NBLOCKS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, comp_rows, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NROWS, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w_rows, 2 * LANES), jnp.int8),
                        pltpu.VMEM((2 * DCHUNK, tiles, LANES), jnp.int16),
                        pltpu.VMEM((2 * DCHUNK, tiles, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )
    kern = functools.partial(_k, comp_rows=comp_rows, out_rows=NROWS)
    return pl.pallas_call(kern, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((NBLOCKS, NROWS, 128), jnp.uint8))

args = (jnp.asarray(plans["p_used"]), jnp.asarray(plans["p_off"]), jnp.asarray(plans["p0"]),
        jnp.asarray(plans["rlo"]), jnp.asarray(plans["rhi"]),
        jnp.asarray(plans["se"]), jnp.asarray(plans["shift"]), jnp.asarray(planes_np))

for abl in ("full", "nomatmul", "nocond", "noshuffle", "norowcast", "nostore", "empty"):
    f = make_kernel(abl)
    try:
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
        print(f"{abl}: FAILED {str(e)[:200]}")
eng.recycle(unit); eng.release()
