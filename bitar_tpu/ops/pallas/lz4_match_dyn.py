"""Per-block dynamic-offset Pallas matcher + sampled offset detector.

Round-4 replacement for the static candidate-offset matcher on the
full-offload compression path.  The static kernel (``lz4_match.py``)
scores a fixed offset tuple — it misses every period not in the tuple
(measured: the bench text class has period 47/49 and compressed to
ratio 1.00 with offsets containing 48).  This module makes the offset
set **data-derived and per block**:

1. **Detector** (XLA, sub-ms / 64 x 128 KiB): sample every
   ``stride``-th position's 4-byte value, sort ``(value, index)``, and
   histogram the index deltas of equal-value neighbors.  Content that
   repeats with period g collides at sampled deltas that are multiples
   of g — and for periodic data a multiple of the period is itself a
   byte-true match offset, so the detector needs no alignment with the
   true period.  Top-K deltas per block become that block's candidate
   offsets; blocks with no repeats detect zero offsets and skip match
   scoring entirely (the incompressible escape costs ~0 device time).
   Window: any period <= max_off/stride, plus stride-aligned periods up
   to max_off; entropy-heavy text (arbitrary one-off offsets) stays a
   host-matcher workload — see NEXT_STEPS.
2. **Matcher kernel** (Pallas): for each block, loop over its REAL
   offset count (``lax.fori_loop`` with a per-block SMEM trip count).
   The dynamic shift-back ``plane[p - d]`` decomposes d into its binary
   row component (conditional static sublane rolls — measured: dynamic
   ``pl.ds`` whole-plane row reads lower to per-row copies at ~1.7
   us/row, 1000x slower) and a lane component done as two in-tile
   dynamic-lane gathers + parity select (any d in [1, L) is legal, so
   the detector's halving-refined true periods work).  Run lengths come
   from the same capped log-doubling as the static kernel; prefixes of
   a hinted run are byte-true, which is the emission contract.

Reference contrast: bitar ships raw bytes to the DPU DEFLATE engine
(``src/device.cc:157-238``) whose hardware match search is offset-
unrestricted; the detector+dynamic-kernel pair is the TPU shape of
that capability, restricted to the top-K periods the data exhibits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

#: offset slots per block (static); unused slots carry 0 and are skipped
DEFAULT_K = 4
#: sampling stride; must be a multiple of 64 (the kernel's lane-shift
#: contract) and divide 128*nrows.  128 KiB -> 2048 samples per block.
DEFAULT_STRIDE = 64


@functools.partial(jax.jit, static_argnames=("k", "stride", "max_off",
                                             "min_hits"))
def detect_offsets(planes, *, k: int = DEFAULT_K, stride: int = DEFAULT_STRIDE,
                   max_off: int = 0xFFFF, min_hits: int = 4):
    """Top-k repeated-content offsets per block from strided samples.

    Args:
      planes: [N, L] uint8 raw blocks (zero padding past real length is
        fine — padding collides at stride deltas and detects offset
        ``stride``, which scores no matches in real data).
    Returns (offs [N, k] int32, cnt [N, k] int32): per-block candidate
    offsets (0 = empty slot), most frequent first, each seen at least
    ``min_hits`` times among sample-neighbor pairs, all in
    [1, max_off]: stride-multiple deltas from the sample sort, halving-
    refined toward the true period (see the refinement block).
    """
    if stride % 64:
        raise ValueError("detector stride must be a multiple of 64")
    n, L = planes.shape
    s = L // stride
    b = planes.astype(jnp.uint32)
    # 4-byte little-endian value at each sampled position.
    v = (b[:, 0:][:, ::stride][:, :s]
         | (b[:, 1:][:, ::stride][:, :s] << 8)
         | (b[:, 2:][:, ::stride][:, :s] << 16)
         | (b[:, 3:][:, ::stride][:, :s] << 24))
    idx = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), v.shape)
    sv, sp = lax.sort((v, idx), dimension=1, num_keys=2)
    same = jnp.concatenate(
        [jnp.zeros((n, 1), bool), sv[:, 1:] == sv[:, :-1]], axis=1)
    prev = jnp.concatenate([jnp.zeros((n, 1), jnp.int32), sp[:, :-1]], axis=1)
    delta = (sp - prev) * stride
    ok = same & (delta > 0) & (delta <= max_off)
    delta = jnp.where(ok, delta, 0)
    # Frequency per distinct delta: sort deltas, run lengths via index
    # arithmetic on run boundaries (no scatter, no histogram table).
    ds = jnp.sort(delta, axis=1)
    i32 = jnp.arange(s, dtype=jnp.int32)
    new_run = jnp.concatenate(
        [jnp.ones((n, 1), bool), ds[:, 1:] != ds[:, :-1]], axis=1)
    rstart = lax.associative_scan(
        jnp.maximum, jnp.where(new_run, i32[None, :], 0), axis=1)
    run_len = i32[None, :] - rstart + 1
    last = jnp.concatenate(
        [ds[:, 1:] != ds[:, :-1], jnp.ones((n, 1), bool)], axis=1)
    score = jnp.where(last & (ds > 0) & (run_len >= min_hits), run_len, 0)
    top, ti = lax.top_k(score, k)
    offs = jnp.take_along_axis(ds, ti, axis=1)
    offs = jnp.where(top > 0, offs, 0).astype(jnp.int32)

    # Halving refinement: a sampled delta is some multiple m * 2^j of
    # the true period (m odd), so the period itself is always reachable
    # by <= 7 halvings of the detected stride-multiple.  Shorter offsets
    # shrink the un-matchable head (history < offset is all literals:
    # period 47 detected as 3008 wastes a 3 KiB literal head per block).
    # Validity of each halving is an exact 4-byte equality test at 16
    # sampled positions — ONE fused gather; a false accept needs 16
    # accidental 4-byte collisions, and even then hints stay byte-true
    # (the matcher verifies equality), so the risk is ratio-only.
    s2 = 16
    halvings = 8
    v32 = (b[:, 0:L - 3]
           | (b[:, 1:L - 2] << 8)
           | (b[:, 2:L - 1] << 16)
           | (b[:, 3:L] << 24))
    step2 = max(1, (L - 8) // (2 * s2))
    p_i = (L - 8 - jnp.arange(s2, dtype=jnp.int32) * step2)        # [S2]
    cand = jnp.maximum(
        offs[:, :, None] >> jnp.arange(halvings, dtype=jnp.int32)[None, None, :],
        1)                                                         # [N,K,H]
    src = p_i[None, None, None, :] - cand[:, :, :, None]           # [N,K,H,S2]
    ok_src = src >= 0
    gat = jnp.take_along_axis(
        v32, jnp.clip(src, 0, L - 4).reshape(n, -1), axis=1
    ).reshape(n, k, halvings, s2)
    base = jnp.take_along_axis(
        v32, jnp.broadcast_to(p_i[None], (n, s2)), axis=1)         # [N,S2]
    valid = ((gat == base[:, None, None, :]) & ok_src).all(axis=3)  # [N,K,H]
    valid = valid & (cand >= 1) & (offs[:, :, None] > 0)
    best = jnp.where(valid, cand, jnp.int32(1 << 30)).min(axis=2)
    offs = jnp.where(offs > 0, jnp.minimum(best, offs), 0)
    return offs, top.astype(jnp.int32)


def _dyn_match_kernel(noff_ref, offs_ref, comp_ref, len_ref, off_ref,
                      *, nrows, max_match, max_qbit):
    """One grid step scores one block's detected offsets.

    noff_ref (N,) SMEM   per-block real offset count (0..K)
    offs_ref (N, K) SMEM per-block offsets (64-multiples; 0-padded)
    comp_ref (1, nrows, 128) VMEM uint8 raw plane
    """
    b = pl.program_id(0)
    plane = comp_ref[0].astype(jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, (nrows, LANES), 1)
    byte_iota = lax.broadcasted_iota(jnp.int32, (nrows, LANES), 0) * LANES + lane

    len_ref[0] = jnp.zeros((nrows, LANES), jnp.int32)
    off_ref[0] = jnp.zeros((nrows, LANES), jnp.int32)

    def shift_fwd(p, d: int):
        """p[i + d] for static d >= 1 (run doubling)."""
        q, r = divmod(d, LANES)
        a = pltpu.roll(p, (nrows - q) % nrows, axis=0)
        if r == 0:
            return a
        bb = pltpu.roll(p, (nrows - q - 1) % nrows, axis=0)
        a = pltpu.roll(a, LANES - r, axis=1)
        bb = pltpu.roll(bb, LANES - r, axis=1)
        return jnp.where(lane < LANES - r, a, bb)

    def roll_rows_dyn(p, q):
        """roll(p, q, axis=0) for a traced q via binary decomposition:
        log2(nrows) conditional static sublane rolls (a dynamic pl.ds
        whole-plane read measured ~1.7 us/row — per-row copies)."""
        v = p
        for bit in range(max_qbit):
            amt = 1 << bit
            rolled = pltpu.roll(v, amt, axis=0)
            on = lax.bitwise_and(q, amt) != 0
            v = jnp.where(on, rolled, v)
        return v

    @pl.when(noff_ref[b] > 0)
    def _():
        def body(ki, _):
            d = offs_ref[b, ki]
            q = d // LANES
            r = lax.rem(d, LANES)
            # shifted[p] = plane[p - d]: row part via decomposed roll,
            # lane part via two in-tile dynamic-lane gathers + parity
            # select (the decode kernel's take pattern — a dynamic
            # whole-plane pl.ds row read measured ~1.7 us/row instead).
            a = roll_rows_dyn(plane, q)
            bb = pltpu.roll(a, 1, axis=0)        # rows i - q - 1
            ql = (lane - r) & (LANES - 1)
            va = jnp.take_along_axis(a, ql, axis=1)
            vb = jnp.take_along_axis(bb, ql, axis=1)
            shifted = jnp.where(lane >= r, va, vb)
            eq = jnp.logical_and(plane == shifted, byte_iota >= d)
            run = eq.astype(jnp.int32)
            step = 1
            while step < max_match:
                nxt = shift_fwd(run, step)
                run = jnp.where(run == step, run + nxt, run)
                step *= 2
            run = jnp.minimum(run, max_match)
            better = run > len_ref[0]
            len_ref[0] = jnp.where(better, run, len_ref[0])
            off_ref[0] = jnp.where(better, d, off_ref[0])
            return 0

        lax.fori_loop(0, noff_ref[b], body, 0)


@functools.partial(jax.jit, static_argnames=("nrows", "max_match",
                                             "interpret"))
def find_matches_dyn(comp, noff, offs, *, nrows: int,
                     max_match: int = 512, interpret: bool = False):
    """Score per-block dynamic offsets for a batch of blocks.

    Args:
      comp: [N, nrows, 128] uint8 raw byte planes
      noff: [N] int32 per-block real offset count
      offs: [N, K] int32 per-block offsets (>= 1 in the first noff
        slots; the binary row decomposition requires offs < nrows * 128)
    Returns (mlen [N, nrows, 128] int32 capped at max_match, prefix
    byte-true; moff [N, nrows, 128] int32 offset values).
    """
    n = comp.shape[0]
    max_qbit = max(1, (nrows - 1).bit_length())
    kernel = functools.partial(_dyn_match_kernel, nrows=nrows,
                               max_match=max_match, max_qbit=max_qbit)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, nrows, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, nrows, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nrows, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n, nrows, 128), jnp.int32),
        ),
        interpret=interpret,
        **kwargs,
    )(noff, offs, comp)
