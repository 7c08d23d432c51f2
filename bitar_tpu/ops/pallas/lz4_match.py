"""Pallas TPU match-finding kernel for LZ4/Snappy compression.

The compress-side analog of the plan-execute decoder: the heavy, data-
parallel part of compression — match *search* — runs on the TPU; the
cheap, sequential part — greedy parse + byte emission — runs in the
native host library (``bt_lz4_emit_sequences``).

Design: hash-table matchers are pointer-chasing machines and map terribly
onto a 128-lane vector core.  Instead the kernel scores a static set of
CANDIDATE OFFSETS: for each offset d it builds the shifted byte plane
``x[p-d]`` (two static row rolls + one static lane roll + select — no
gathers), compares it with the block, and computes the run length of the
match starting at every position via log-doubling (capped).  The best
(length, offset) per position is folded across candidates.

This is a *restricted-window* matcher: offsets outside the candidate set
are never found, so entropy-heavy text compresses worse than the host
matcher (which remains the default / quality path).  Runs, stride
patterns, and record-structured data — the classic accelerator
compression targets — are covered well.  Candidate sets are tunable per
engine config.

Reference contrast: bitar ships bytes to the DPU's DEFLATE engine and
never sees match finding (``src/device.cc``); this kernel is what "the
accelerator does the compression work" means on a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Default candidate offsets: dense short range (RLE, small periods),
# then power-of-two-ish strides (records, columnar patterns).
DEFAULT_OFFSETS = (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 20, 24, 32, 48, 64,
                   96, 128, 192, 256, 384, 512, 1024, 2048, 4096, 8192)

MAX_MATCH = 64   # default run-length cap (log-doubling depth 6); the host
                 # emitter extends past it.  The device emitter cannot, so
                 # the device-compress path passes a larger ``max_match``
                 # (log-doubling depth grows by 1 per doubling).


def _shift_back(plane, d: int, nrows: int):
    """shifted[p] = plane[p - d] (byte-space), d static positive.

    p = 128 i + j ; d = 128 q + r:  j >= r -> (i - q, j - r),
    else (i - q - 1, j - r + 128).  Both cases are the SAME lane rotation
    of two row-rolled planes, merged by a lane mask."""
    q, r = divmod(d, LANES)
    a = pltpu.roll(plane, q, axis=0)          # rows: plane[i - q]
    b = pltpu.roll(plane, q + 1, axis=0)      # rows: plane[i - q - 1]
    if r:
        a = pltpu.roll(a, r, axis=1)
        b = pltpu.roll(b, r, axis=1)
        lane = lax.broadcasted_iota(jnp.int32, (nrows, LANES), 1)
        return jnp.where(lane >= r, a, b)
    return a


def _shift_fwd(plane, d: int, nrows: int):
    """shifted[p] = plane[p + d], d static positive (for run doubling).

    pltpu.roll requires non-negative shifts; a forward shift by d is a
    backward roll by (size - d)."""
    q, r = divmod(d, LANES)
    a = pltpu.roll(plane, (nrows - q) % nrows, axis=0)
    b = pltpu.roll(plane, (nrows - q - 1) % nrows, axis=0)
    if r:
        a = pltpu.roll(a, LANES - r, axis=1)
        b = pltpu.roll(b, LANES - r, axis=1)
        lane = lax.broadcasted_iota(jnp.int32, (nrows, LANES), 1)
        return jnp.where(lane < LANES - r, a, b)
    return a


def _match_kernel(comp_ref, len_ref, off_ref, *, offsets, nrows,
                  max_match=MAX_MATCH, emit_values=False):
    # Working set stays int32 math-wise but is carried as narrow planes
    # where possible; the offset loop is unrolled (static roll amounts),
    # so live-buffer count drives VMEM — see CompilerParams in the caller.
    plane = comp_ref[0, :, :].astype(jnp.int32)
    byte_iota = (lax.broadcasted_iota(jnp.int32, (nrows, LANES), 0) * LANES
                 + lax.broadcasted_iota(jnp.int32, (nrows, LANES), 1))

    best_len = jnp.zeros((nrows, LANES), jnp.int32)
    best_idx = jnp.zeros((nrows, LANES), jnp.int32)

    for di, d in enumerate(offsets):
        shifted = _shift_back(plane, d, nrows)
        eq = jnp.logical_and(plane == shifted, byte_iota >= d)
        run = eq.astype(jnp.int32)
        # log-doubling run length, capped at max_match
        step = 1
        while step < max_match:
            nxt = _shift_fwd(run, step, nrows)
            run = jnp.where(run == step, run + nxt, run)
            step *= 2
        better = run > best_len
        best_len = jnp.where(better, run, best_len)
        best_idx = jnp.where(better, d if emit_values else di, best_idx)

    len_ref[0, :, :] = jnp.minimum(best_len, max_match)
    off_ref[0, :, :] = best_idx


@functools.partial(jax.jit, static_argnames=("offsets", "nrows", "interpret",
                                              "max_match", "emit_values"))
def find_matches(comp, *, offsets: tuple[int, ...] = DEFAULT_OFFSETS,
                 nrows: int, interpret: bool = False,
                 max_match: int = MAX_MATCH, emit_values: bool = False):
    """Score candidate-offset matches for a batch of blocks.

    Args:
      comp: [N, nrows, 128] uint8 raw byte planes
      emit_values: when True the second output carries the offset VALUE
        (the distance itself) instead of the index into ``offsets`` —
        the device-emission path wants values and a table lookup on the
        far side of the kernel is a (measured) 70 ms XLA gather.
    Returns (match_len [N, nrows, 128] int32 capped at ``max_match``,
             offset index or value [N, nrows, 128] int32).
    """
    n = comp.shape[0]
    kernel = functools.partial(_match_kernel, offsets=offsets, nrows=nrows,
                               max_match=max_match, emit_values=emit_values)
    kwargs = {}
    if not interpret:
        # The unrolled offset loop keeps many live planes; allow the
        # compiler a bigger scoped-VMEM budget than the 16 MiB default.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, nrows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, nrows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n, nrows, 128), jnp.int32),
        ),
        interpret=interpret,
        **kwargs,
    )(comp)
