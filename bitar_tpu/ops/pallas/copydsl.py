"""Vector byte-copy primitives shared by the Pallas codec kernels.

All operate on int32 byte planes (see ``layout.py``): ``[rows, 128]`` refs
with one byte per lane element and guard rows at the tail.  The core trick:
any 128-byte chunk at byte offset ``p`` spans the two consecutive rows
``p >> 7`` and ``(p >> 7) + 1``; rotating each row left by ``p & 127`` with
a barrel shifter (7 static ``pltpu.roll`` steps — Mosaic has no dynamic
lane indexing) and lane-selecting between them aligns the chunk into one
vector row.  Writes are masked read-modify-writes of the same two rows.

This module is the TPU replacement for the reference's mbuf assembly/copy
machinery (``src/memory.cc:78-116``): where bitar *avoids* copies by
attaching external buffers for the DPU's DMA engine, a TPU kernel's "DMA
engine" is the VPU itself and these chunked vector moves are the zero-copy
path (HBM -> VMEM -> HBM with no host involvement).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _lane_iota():
    return lax.broadcasted_iota(jnp.int32, (1, LANES), dimension=1)


def rot_left(v, amount, width: int = LANES):
    """Rotate (rows, width) lanes left by a dynamic amount in [0, width).

    result[:, i] = v[:, (i + amount) % width], via log2(width) static roll
    steps selected by the bits of ``amount`` (jnp.roll right-shifts, so
    left rotation by 2^k is a static roll of width - 2^k)."""
    for k in range(width.bit_length() - 1):
        bit = (amount >> k) & 1
        rolled = pltpu.roll(v, width - (1 << k), axis=1)
        v = jnp.where(bit == 1, rolled, v)
    return v


def extract_scalar(ref, s):
    """Read element ``s`` of a lane-tiled int32 table ref ([rows, 128]) as
    a scalar: dynamic-row vector load + barrel rotate + lane-0 extract.
    (Scalar VMEM loads with dynamic lane indices do not lower on Mosaic.)"""
    row = lax.shift_right_logical(s, 7)
    col = lax.bitwise_and(s, LANES - 1)
    v = ref[pl.ds(row, 1), :]            # (1, 128)
    v = rot_left(v, col)
    return v[0, 0]


def read_chunk(ref, pos):
    """Read 128 bytes at arbitrary byte offset ``pos`` -> (1, 128).

    Loads the 2-row window, rotates both rows by the lane offset, and
    selects: lanes [0, 128-col) come from row 0, the rest from row 1."""
    row = lax.shift_right_logical(pos, 7)
    col = lax.bitwise_and(pos, LANES - 1)
    win = rot_left(ref[pl.ds(row, 2), :], col)       # (2, 128), both rotated
    take0 = _lane_iota() < (LANES - col)
    return jnp.where(take0, win[0:1, :], win[1:2, :])


def write_chunk(ref, pos, vec, length):
    """Write ``length`` (<=128) bytes of (1,128) ``vec`` at byte offset
    ``pos`` via masked read-modify-write of the 2-row window.

    ``rotated = rot_right(vec, col)`` places vec byte ``j - col`` at lane
    ``j`` (row 0's view) and vec byte ``j + 128 - col`` at lane ``j``
    (row 1's view) — one rotate serves both rows."""
    row = lax.shift_right_logical(pos, 7)
    col = lax.bitwise_and(pos, LANES - 1)
    win = ref[pl.ds(row, 2), :]                       # (2, 128)
    rotated = rot_left(vec, LANES - col)              # right-rotate by col
    iota = _lane_iota()
    mask0 = jnp.logical_and(iota >= col, iota < col + length)
    mask1 = iota < (col + length - LANES)
    new0 = jnp.where(mask0, rotated, win[0:1, :])
    new1 = jnp.where(mask1, rotated, win[1:2, :])
    ref[pl.ds(row, 1), :] = new0
    ref[pl.ds(row + 1, 1), :] = new1


def copy_span(src_ref, dst_ref, src0, dst0, n):
    """Copy ``n`` bytes (dynamic) from byte offset src0 in src_ref to dst0
    in dst_ref, in sequential 128-byte chunks.

    Sequential chunk order makes self-referencing copies valid whenever the
    src->dst distance is >= 128 (each chunk reads only bytes written by
    earlier chunks), matching LZ4's forward-copy semantics."""

    def cond(k):
        return k < n

    def body(k):
        ln = jnp.minimum(LANES, n - k)
        v = read_chunk(src_ref, src0 + k)
        write_chunk(dst_ref, dst0 + k, v, ln)
        return k + LANES

    lax.while_loop(cond, body, jnp.int32(0))


def copy_match(out_ref, dst0, mlen, offset):
    """LZ4-style match copy: ``mlen`` bytes into ``dst0`` from
    ``dst0 - offset`` within the same (partially written) output plane.

    Overlapping matches (offset < 128, the RLE case) are resolved by
    iterative doubling: after seeding ``offset`` bytes, each round copies a
    non-overlapping span of length min(valid, remaining), doubling the
    valid prefix — log2(mlen/offset) rounds instead of a per-byte loop."""
    src0 = dst0 - offset

    @pl.when(offset >= LANES)
    def _direct():
        copy_span(out_ref, out_ref, src0, dst0, mlen)

    @pl.when(offset < LANES)
    def _doubling():
        seed = jnp.minimum(offset, mlen)
        copy_span(out_ref, out_ref, src0, dst0, seed)

        def cond(d):
            return d < mlen

        def body(d):
            ln = jnp.minimum(d, mlen - d)
            copy_span(out_ref, out_ref, dst0, dst0 + d, ln)
            return d + ln

        lax.while_loop(cond, body, seed)


__all__ = [
    "LANES",
    "copy_match",
    "copy_span",
    "extract_scalar",
    "read_chunk",
    "rot_left",
    "write_chunk",
]
