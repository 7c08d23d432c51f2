"""Plan-execute Pallas decoder: dense scheduled slope-1 fragment passes.

The mesh-sharded decode path: dense [n, passes, tiles, 128] plans shard
cleanly over a device mesh (``parallel/pipeline.py`` fuses them with the
all_to_all shuffle), unlike the ragged flat wire of the single-chip fast
path (``lz4_decode_flat.py``, which supersedes this kernel on one chip).  The host planner (``plan.cc``) turns a
block into P scheduled passes; each pass materializes at most one fragment
per 128-byte output row, with every fragment a slope-1 copy from a single
stacked source plane S = [comp rows | output rows].  One pass is pure
vector work:

  1. broadcast the pass's per-row plan (start/end/shift) across lanes
  2. per byte: q = p + shift; all active source bytes of a row live in two
     consecutive S rows (slope-1 ⇒ the q interval spans < 2 rows)
  3. fetch both rows for every output row with an MXU one-hot matmul
     (bf16 one-hot x byte plane — exact for byte values)
  4. per-lane dynamic gather (``take_along_axis`` axis=1, the TPU's native
     128-lane shuffle) picks each byte's lane; a parity select merges the
     two row candidates
  5. masked write into the output region of S (later passes read it)

No scalar per-sequence loop exists anywhere in this kernel; this is the
TPU-native answer to the reference's byte-serial DEFLATE hot loop
(``src/device.cc:157-318``).

Wire-format notes (they matter: every launch streams its operands, so
bytes-per-block dominate end-to-end cost):

* compressed input arrives as uint8 planes (no int32 expansion),
* output leaves as uint8 planes,
* plan cells are 8 bytes each: an int32 ``shift`` plus an int32 ``se``
  packing the row-relative [start, end) byte range (start << 8 | end,
  both in [0, 128]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
KCHUNK = 1024


def _rowcast(tile):
    """(t, 128) lane-major per-row values -> (t*128, 128) lane broadcast.

    Row i's value lives at tile[i >> 7, i & 127]; the result carries it on
    every lane of row i.  Mosaic cannot reshape lanes into sublanes, so:
    transpose to sublane-major, lane-broadcast each column, stack."""
    t = tile.shape[0]
    vt = tile.T                                   # (128, t), sublane-major
    cols = [jnp.broadcast_to(vt[:, a:a + 1], (LANES, LANES)) for a in range(t)]
    return jnp.concatenate(cols, axis=0) if t > 1 else cols[0]


def _planned_kernel(p_used_ref, se_ref, shift_ref, comp_ref, out_ref, s_ref, *,
                    passes: int, comp_rows: int, out_rows: int):
    """One grid step decodes one block.

    Refs:
      p_used_ref (N,) SMEM                 scalar-prefetch: per-block pass
                                           count (the loop skips padding)
      se_ref    (1, P, tiles, 128) VMEM    packed start<<8|end per (pass,row)
      shift_ref (1, P, tiles, 128) VMEM    source shift per (pass,row)
      comp_ref  (1, comp_rows, 128) VMEM   uint8 compressed byte plane
      out_ref   (1, out_rows, 128) VMEM    uint8 decoded byte plane
      s_ref     (w_rows, 128) bf16 scratch stacked [comp | out] plane
    """
    nrows = out_rows
    w_rows = s_ref.shape[0]

    s_ref[0:comp_rows, :] = comp_ref[0, :, :].astype(jnp.int32).astype(jnp.bfloat16)
    s_ref[comp_rows:, :] = jnp.zeros((w_rows - comp_rows, LANES), jnp.bfloat16)

    lane_iota = lax.broadcasted_iota(jnp.int32, (nrows, LANES), 1)
    row_base = lax.broadcasted_iota(jnp.int32, (nrows, LANES), 0) * LANES
    byte_iota = row_base + lane_iota
    kiota = lax.broadcasted_iota(jnp.int32, (nrows, KCHUNK), 1)

    def row_gather(row_idx):
        """rows[i] = S[row_idx[i]] via K-chunked one-hot MXU matmuls."""
        acc = jnp.zeros((nrows, LANES), jnp.float32)
        for ck in range(0, w_rows, KCHUNK):
            oh = (kiota == (row_idx - ck)).astype(jnp.bfloat16)
            acc += jnp.dot(oh, s_ref[ck:ck + KCHUNK, :],
                           preferred_element_type=jnp.float32)
        return acc

    def pass_body(k, _):
        # Dynamic pass index: one compiled body regardless of P (an
        # unrolled loop made Mosaic compile time explode with pass count).
        se = _rowcast(se_ref[0, pl.ds(k, 1)][0])
        shift = _rowcast(shift_ref[0, pl.ds(k, 1)][0])
        start = lax.shift_right_logical(se, 8)        # row-relative [0, 128]
        end = lax.bitwise_and(se, 0xFF)

        active = jnp.logical_and(lane_iota >= start, lane_iota < end)
        q = byte_iota + shift
        qrow = lax.shift_right_logical(jnp.where(active, q, 0), 7)
        qlane = lax.bitwise_and(q, LANES - 1)

        qrow_masked = jnp.where(active, qrow, 1 << 29)
        row_a = jnp.minimum(jnp.min(qrow_masked, axis=1, keepdims=True),
                            w_rows - 2)

        gath_a = row_gather(row_a)
        gath_b = row_gather(row_a + 1)
        v_a = jnp.take_along_axis(gath_a, qlane, axis=1)
        v_b = jnp.take_along_axis(gath_b, qlane, axis=1)
        val = jnp.where(qrow == row_a, v_a, v_b).astype(jnp.bfloat16)

        cur = s_ref[comp_rows:comp_rows + nrows, :]
        s_ref[comp_rows:comp_rows + nrows, :] = jnp.where(active, val, cur)
        return 0

    lax.fori_loop(0, jnp.minimum(p_used_ref[pl.program_id(0)], passes),
                  pass_body, 0)

    out_ref[0, :, :] = (
        s_ref[comp_rows:comp_rows + nrows, :].astype(jnp.int32).astype(jnp.uint8))


@functools.partial(
    jax.jit,
    static_argnames=("passes", "comp_rows", "out_rows", "interpret"))
def decode_blocks_planned(comp, p_used, se, shift, *, passes: int,
                          comp_rows: int, out_rows: int,
                          interpret: bool = False):
    """Decode a batch of blocks via their scheduled fragment plans.

    Args:
      comp:   [N, comp_rows, 128] uint8 compressed byte planes
      p_used: [N] int32 per-block pass counts (scalar-prefetched; the
              kernel loops only this far, skipping pad passes)
      se:    [N, passes, out_rows/128, 128] int32, start<<8|end packed
             row-relative active ranges (row i at [.., i >> 7, i & 127])
      shift: [N, passes, out_rows/128, 128] int32 source shifts, with
             out-space cells already rebased by comp_rows*128

    Returns [N, out_rows, 128] uint8 decoded byte planes.
    """
    n = comp.shape[0]
    nrows = out_rows
    assert nrows % LANES == 0, "planned kernel requires out_rows % 128 == 0"
    assert comp_rows % 32 == 0, "uint8 comp planes need 32-row tiling"
    tiles = nrows // LANES
    w_rows = -(-(comp_rows + nrows) // KCHUNK) * KCHUNK
    plan_spec = pl.BlockSpec((1, passes, tiles, LANES),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            plan_spec, plan_spec,
            pl.BlockSpec((1, comp_rows, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w_rows, LANES), jnp.bfloat16)],
    )
    kernel = functools.partial(
        _planned_kernel, passes=passes, comp_rows=comp_rows,
        out_rows=out_rows)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_rows, 128), jnp.uint8),
        interpret=interpret,
    )(p_used, se, shift, comp)


def pack_plan(r_dstart, r_dend, r_shift, p0, total_passes, comp_rows):
    """Host-side plan packing for one block.

    Takes the planner's [P, nrows] int32 tables (block-absolute dstart/dend,
    raw shifts, comp-pass count p0) and produces the kernel wire format:
    (se [total_passes, nrows], shift [total_passes, nrows]) with
    row-relative ranges and out-space shifts rebased into the stacked plane.
    """
    import numpy as np

    P = r_dstart.shape[0]
    nrows = r_dstart.shape[1]
    row_lo = np.arange(nrows, dtype=np.int32)[None, :] * LANES
    start = np.clip(r_dstart - row_lo, 0, LANES).astype(np.int32)
    end = np.clip(r_dend - row_lo, 0, LANES).astype(np.int32)
    # empty cells: dstart == dend == 0 -> start=end=0 -> inactive
    se = (start << 8) | end
    shift = r_shift.copy()
    shift[p0:P] += comp_rows * LANES
    out_se = np.zeros((total_passes, nrows), np.int32)
    out_shift = np.zeros((total_passes, nrows), np.int32)
    out_se[:P] = se
    out_shift[:P] = shift
    return out_se, out_shift
