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
    # 4-byte little-endian value at each sampled position, read as a
    # contiguous reshape slice: [n, s, stride][:, :, :4].  Four strided
    # ::stride slices measured 3.2 ms per 256 x 128 KiB (each re-walks
    # the full plane); the reshape form reads the corpus once.
    ps = planes.reshape(n, s, stride)[:, :, :4].astype(jnp.uint32)
    v = ps[:, :, 0] | (ps[:, :, 1] << 8) | (ps[:, :, 2] << 16) \
        | (ps[:, :, 3] << 24)
    # ONE single-key sort of hash(21b) | index(11b): XLA's variadic
    # 2-key sort measured ~2x a single-key sort.  A hash collision
    # (2^-21 per pair) can surface a junk delta; the match kernel
    # verifies byte equality, so the cost is a wasted candidate slot,
    # never a wrong byte.
    assert s <= 2048, "sample index must fit 11 bits"
    h = (v * jnp.uint32(2654435761)) & jnp.uint32(0xFFFFF800)
    key = (h | jnp.arange(s, dtype=jnp.uint32)).astype(jnp.uint32)
    sk = jnp.sort(key, axis=1)
    sp = (sk & 0x7FF).astype(jnp.int32)
    hv = sk >> 11
    same = jnp.concatenate(
        [jnp.zeros((n, 1), bool), hv[:, 1:] == hv[:, :-1]], axis=1)
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
    # Validity of each halving is an exact 4-byte equality test at 8
    # sampled positions — ONE fused gather; a false accept needs 8
    # accidental 4-byte collisions, and even then hints stay byte-true
    # (the matcher verifies equality), so the risk is ratio-only.  The
    # 4 KiB window / 8 probes trimmed the refine stage ~2x on-chip
    # with no measured ratio change; candidates past the window keep
    # their unrefined (byte-true) multiple.
    s2 = 8
    halvings = 8
    # Validation reads stay in a TAIL WINDOW of the block: a whole-plane
    # uint32 view + gather measured ~6 ms per 256 x 128 KiB (TPU gather
    # cost is proportional to OPERAND size); the window is a static
    # slice, so w32 is [N, win] and the halving gather's operand is 64x
    # smaller.  Candidates beyond the window keep their unrefined delta
    # — still a byte-true multiple of the period (the match kernel
    # verifies equality), just with a longer literal head.
    win = min(L, 4096)
    wbase = L - win
    wb = planes[:, wbase:].astype(jnp.uint32)
    w32 = (wb[:, 0:win - 3]
           | (wb[:, 1:win - 2] << 8)
           | (wb[:, 2:win - 1] << 16)
           | (wb[:, 3:win] << 24))
    step2 = max(1, (win - 8) // (2 * s2))
    p_i = (win - 8 - jnp.arange(s2, dtype=jnp.int32) * step2)      # [S2]
    cand = jnp.maximum(
        offs[:, :, None] >> jnp.arange(halvings, dtype=jnp.int32)[None, None, :],
        1)                                                         # [N,K,H]
    src = p_i[None, None, None, :] - cand[:, :, :, None]           # [N,K,H,S2]
    ok_src = src >= 0
    gat = jnp.take_along_axis(
        w32, jnp.clip(src, 0, win - 4).reshape(n, -1), axis=1
    ).reshape(n, k, halvings, s2)
    base = w32[:, p_i]                                             # [N,S2]
    valid = ((gat == base[:, None, None, :]) & ok_src).all(axis=3)  # [N,K,H]
    # A halving only refines when its sources fit the window (ok_src
    # everywhere) — checked above — and the candidate is live.
    valid = valid & (cand >= 1) & (offs[:, :, None] > 0)
    best = jnp.where(valid, cand, jnp.int32(1 << 30)).min(axis=2)
    offs = jnp.where(offs > 0, jnp.minimum(best, offs), 0)
    return offs, top.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "max_off"))
def detect_offsets_fft(planes, *, k: int = 2, max_off: int = 0xFFFF):
    """Top-k match offsets by FFT autocorrelation (Wiener-Khinchin).

    The sampled-sort detector only sees deltas that are multiples of
    its stride, so a strong period g is invisible whenever
    lcm(stride, g) exceeds the offset window — e.g. a corpus tiled at
    40694 bytes (= 2 x 20347) never collides on a 64-byte grid.  The
    autocorrelation peak finds ANY dominant period at lag resolution 1
    in one rfft/irfft pair (~0.1 ms/128 KiB block on v5e — an order
    costlier than the sampled detector, so callers opt in via
    ``detect_fft`` where text-shaped data is expected).

    A wrong candidate costs a wasted matcher slot, never a wrong byte:
    the match kernel verifies byte equality (same contract as the
    sampled detector's hash collisions).

    Returns (offs [N, k] int32 in [8, max_off] — 0 marks a peak that
    fell outside the window — and the raw peak scores)."""
    n, L = planes.shape
    x = planes.astype(jnp.float32)
    x = x - jnp.mean(x, axis=1, keepdims=True)
    F = jnp.fft.rfft(x, axis=1)
    ac = jnp.fft.irfft(F * jnp.conj(F), n=L, axis=1)
    # Lags < 8 are trivial self-similarity (and below min_match reach);
    # the window cap keeps offsets encodable in 16 bits.
    ac = ac.at[:, :8].set(-jnp.inf)
    top, ti = lax.top_k(ac[:, :min(max_off, L - 1) + 1], k)
    offs = jnp.where(top > 0, ti.astype(jnp.int32), 0)
    return offs, top


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


def _match_walk_kernel(noff_ref, offs_ref, lens_ref, comp_ref, rec_ref, *,
                       seg, nseg, max_match, min_match, wcap):
    """Fused match scoring + greedy segment parse in ONE grid step,
    SEGMENT-MAJOR layout: rows = byte-in-segment, lanes = segment.

    The caller pre-transposes the uint8 plane once (~0.9 ms per 256 x
    128 KiB — int32 match planes never round-trip HBM at all); in this
    layout every per-segment walk quantity is a native [1, nseg] lane
    vector, so each of the ``wcap`` steps is a row-reduce + a masked
    sum (the natural-layout variant needed log2(srows) masked sublane
    rolls per reduce and measured 6x slower; the XLA walk it replaces
    paid an operand-proportional take_along_axis per iteration).

    Match scoring mirrors ``_dyn_match_kernel`` with the roll roles
    swapped: a shift by d decomposes into d % seg dynamic ROW rolls
    (binary decomposition) and d // seg static LANE shifts with a
    row-wrap borrow.

    rec_ref (1, 3*wcap + 1, nseg) int32: rows [0,W) = global match
    positions P (-1 empty), [W,2W) = truncated lengths, [2W,3W) =
    offsets, row 3W = per-segment overflow flag.
    """
    b = pl.program_id(0)
    plane = comp_ref[0].astype(jnp.int32)          # [seg, nseg]
    G = nseg
    brow = lax.broadcasted_iota(jnp.int32, (seg, G), 0)
    glane = lax.broadcasted_iota(jnp.int32, (seg, G), 1)
    gpos = glane * seg + brow
    max_rbit = max(1, (seg - 1).bit_length())

    def roll_rows_dyn(p, r):
        """row b <- row (b - r) mod seg, traced r (binary decomposition)."""
        v = p
        for bit in range(max_rbit):
            amt = 1 << bit
            rolled = pltpu.roll(v, amt, axis=0)
            on = lax.bitwise_and(r, amt) != 0
            v = jnp.where(on, rolled, v)
        return v

    def shift_fwd(p, s: int):
        """p[pos + s] for static 1 <= s < seg (run doubling)."""
        a = pltpu.roll(p, seg - s, axis=0)         # row b <- b + s (wrap)
        bb = pltpu.roll(a, G - 1, axis=1)          # lane g <- g + 1
        return jnp.where(brow < seg - s, a, bb)

    def score(ki, carry):
        run_best, off_best = carry
        d = offs_ref[b, ki]
        q = d // seg
        r = lax.rem(d, seg)
        x1 = roll_rows_dyn(plane, r)               # row part of p - d
        ql_a = (glane - q) & (G - 1)
        ql_b = (glane - q - 1) & (G - 1)
        va = jnp.take_along_axis(x1, ql_a, axis=1)
        vb = jnp.take_along_axis(x1, ql_b, axis=1)
        shifted = jnp.where(brow >= r, va, vb)     # row-wrap borrows a lane
        eq = jnp.logical_and(plane == shifted, gpos >= d)
        run = eq.astype(jnp.int32)
        step = 1
        while step < max_match:
            run = jnp.where(run == step, run + shift_fwd(run, step), run)
            step *= 2
        run = jnp.minimum(run, max_match)
        better = run > run_best
        return (jnp.where(better, run, run_best),
                jnp.where(better, d, off_best))

    zeros = jnp.zeros((seg, G), jnp.int32)
    run, off = lax.fori_loop(0, noff_ref[b], score, (zeros, zeros))

    # ---- greedy per-segment walk (lane-parallel) ----
    blen = lens_ref[b]
    INF = jnp.int32(seg + seg)
    lim = jnp.minimum(jnp.int32(seg), blen - 5 - glane * seg)
    m_t = jnp.minimum(run, lim - brow)
    valid = (m_t >= min_match) & (gpos < blen - 12) & (off >= 1)
    cand_base = jnp.where(valid, brow, INF)
    lane0 = lax.broadcasted_iota(jnp.int32, (1, G), 1)

    def step(t, pos):
        cand = jnp.where(brow >= pos, cand_base, INF)
        nxt = jnp.min(cand, axis=0, keepdims=True)          # [1, G]
        took = nxt < seg
        oh = (brow == nxt).astype(jnp.int32)                # one writer/col
        m_at = jnp.sum(oh * m_t, axis=0, keepdims=True)
        o_at = jnp.sum(oh * off, axis=0, keepdims=True)
        rec_ref[0, pl.ds(t, 1), :] = jnp.where(
            took, nxt + lane0 * seg, -1)
        rec_ref[0, pl.ds(wcap + t, 1), :] = jnp.where(took, m_at, 0)
        rec_ref[0, pl.ds(2 * wcap + t, 1), :] = jnp.where(took, o_at, 0)
        return jnp.where(took, nxt + m_at, jnp.int32(seg))

    pos = lax.fori_loop(0, wcap, step, jnp.zeros((1, G), jnp.int32))
    cand = jnp.where(brow >= pos, cand_base, INF)
    rec_ref[0, 3 * wcap:3 * wcap + 1, :] = (
        jnp.min(cand, axis=0, keepdims=True) < seg).astype(jnp.int32)


def find_matches_parse_dyn(comp, noff, offs, lengths, *, nrows: int,
                           seg: int, min_match: int, wcap: int = 8,
                           max_match: int = 1024,
                           interpret: bool = False):
    """Fused dynamic-offset match + greedy parse (one Pallas dispatch).

    Args: comp [N, nrows, 128] uint8 raw planes, noff/offs as
    :func:`find_matches_dyn`, lengths [N] int32 block lengths.
    Returns (P, M, O, overflow) exactly like :func:`parse_walk_dyn` —
    but the [N, L] match planes never leave VMEM.
    Requires seg % 128 == 0, nseg <= 128, max_match <= seg.
    """
    n = comp.shape[0]
    L = nrows * LANES
    if seg % LANES or L % seg:
        raise ValueError("seg must be lane-aligned and divide the plane")
    nseg = L // seg
    if nseg > 128:
        raise ValueError("find_matches_parse_dyn: nseg must fit one lane tile")
    if max_match > seg:
        raise ValueError("max_match must be <= seg (segment truncation)")
    # Segment-major relayout of the RAW plane (uint8: ~4x cheaper than
    # transposing the int32 match planes the standalone walk needed).
    comp_sg = comp.reshape(n, nseg, seg).transpose(0, 2, 1)
    kernel = functools.partial(
        _match_walk_kernel, seg=seg, nseg=nseg, max_match=max_match,
        min_match=min_match, wcap=wcap)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, seg, nseg), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3 * wcap + 1, nseg),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    rec = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3 * wcap + 1, nseg), jnp.int32),
        interpret=interpret,
        **kwargs,
    )(noff, offs, jnp.asarray(lengths, jnp.int32), comp_sg)
    P = jnp.moveaxis(rec[:, :wcap, :], 1, 2).reshape(n, nseg * wcap)
    M = jnp.moveaxis(rec[:, wcap:2 * wcap, :], 1, 2).reshape(n, nseg * wcap)
    O = jnp.moveaxis(rec[:, 2 * wcap:3 * wcap, :], 1, 2).reshape(
        n, nseg * wcap)
    overflow = (rec[:, 3 * wcap, :] != 0).any(axis=1)
    return P, M, O, overflow


def _walk_kernel(len_ref, mlen_ref, moff_ref, rec_ref, *, seg, nseg,
                 min_match, wcap):
    """Greedy segment parse, lane-parallel: one grid step walks ONE
    block's ``nseg`` segments simultaneously (segments on LANES, bytes
    down ROWS — the caller pre-transposes to segment-major).

    mlen_ref/moff_ref: (1, seg, nseg) VMEM int32 — match length/offset
    per byte in segment-major layout (``x[b, g]`` = byte ``g*seg + b``).
    len_ref: (N,) SMEM int32 block lengths.
    rec_ref: (1, 3*wcap + 1, nseg) int32 — rows [0,W) = global match
    positions P (-1 = empty slot), [W,2W) = truncated match lengths M,
    [2W,3W) = offsets O, row 3W = overflow flag per segment.

    Replaces the XLA cursor walk whose per-iteration ``take_along_axis``
    scans the whole [N, L] operand (measured ~8.6 ms per iteration at
    256 x 128 KiB — cost is proportional to OPERAND size on TPU): here
    each step is a masked row-reduce + one-hot row gather inside VMEM,
    ~1 us per block-step.
    """
    b = pl.program_id(0)
    blen = len_ref[b]
    L = seg * nseg
    INF = jnp.int32(L + seg)

    brow = lax.broadcasted_iota(jnp.int32, (seg, nseg), 0)   # byte-in-seg
    glane = lax.broadcasted_iota(jnp.int32, (seg, nseg), 1)  # segment id
    gpos = glane * seg + brow                                # global byte

    # Per-byte spec + segment truncation (same rules as parse_and_size):
    # a match may not cross its segment end, must leave >= 5 trailing
    # literals, and may not start in the last 12 bytes of the block.
    lim = jnp.minimum(jnp.int32(seg), blen - 5 - glane * seg)
    m_t = jnp.minimum(mlen_ref[0], lim - brow)
    valid = (m_t >= min_match) & (gpos < blen - 12) & (moff_ref[0] >= 1)
    cand_base = jnp.where(valid, brow, INF)

    state0 = (jnp.zeros((1, nseg), jnp.int32),)              # cursor (seg-local)

    def step(t, state):
        (pos,) = state
        cand = jnp.where(brow >= pos, cand_base, INF)
        nxt = jnp.min(cand, axis=0, keepdims=True)           # [1, nseg]
        took = nxt < seg
        oh = (brow == nxt).astype(jnp.int32)                 # one writer/col
        mlen_at = jnp.sum(oh * m_t, axis=0, keepdims=True)
        moff_at = jnp.sum(oh * moff_ref[0], axis=0, keepdims=True)
        rec_ref[0, pl.ds(t, 1), :] = jnp.where(
            took, nxt + lax.broadcasted_iota(jnp.int32, (1, nseg), 1) * seg,
            -1)
        rec_ref[0, pl.ds(wcap + t, 1), :] = jnp.where(took, mlen_at, 0)
        rec_ref[0, pl.ds(2 * wcap + t, 1), :] = jnp.where(took, moff_at, 0)
        return (jnp.where(took, nxt + mlen_at, jnp.int32(seg)),)

    state = lax.fori_loop(0, wcap, step, state0)
    (pos,) = state
    # Overflow: a segment with remaining matches would DROP sequences.
    cand = jnp.where(brow >= pos, cand_base, INF)
    rec_ref[0, 3 * wcap:3 * wcap + 1, :] = (
        jnp.min(cand, axis=0, keepdims=True) < seg).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("seg", "min_match", "wcap",
                                             "interpret"))
def parse_walk_dyn(mlen, moff, lengths, *, seg: int, min_match: int,
                   wcap: int, interpret: bool = False):
    """Lane-parallel greedy parse of match hints (Pallas).

    Args: mlen/moff [N, L] int32 per-byte match hints, lengths [N].
    Returns (P, M, O, overflow): P/M/O [N, nseg*wcap] int32 in
    (segment-major, step) position order (P = -1 for empty slots, M
    TRUNCATED lengths, O offsets), overflow [N] bool.
    """
    n, L = mlen.shape
    if L % seg:
        raise ValueError("seg must divide L")
    nseg = L // seg
    if nseg > 128:
        raise ValueError("parse_walk_dyn: nseg must fit one lane tile")
    # Segment-major relayout: [n, L] -> [n, seg, nseg].
    mlen_sg = mlen.reshape(n, nseg, seg).transpose(0, 2, 1)
    moff_sg = moff.reshape(n, nseg, seg).transpose(0, 2, 1)
    kernel = functools.partial(
        _walk_kernel, seg=seg, nseg=nseg, min_match=min_match, wcap=wcap)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, seg, nseg), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seg, nseg), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3 * wcap + 1, nseg),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    rec = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3 * wcap + 1, nseg), jnp.int32),
        interpret=interpret,
        **kwargs,
    )(lengths.astype(jnp.int32), mlen_sg, moff_sg)
    # [n, W, G] -> [n, G*W]: (segment, step) IS position order.
    P = jnp.moveaxis(rec[:, :wcap, :], 1, 2).reshape(n, nseg * wcap)
    M = jnp.moveaxis(rec[:, wcap:2 * wcap, :], 1, 2).reshape(n, nseg * wcap)
    O = jnp.moveaxis(rec[:, 2 * wcap:3 * wcap, :], 1, 2).reshape(
        n, nseg * wcap)
    overflow = rec[:, 3 * wcap, :].any(axis=1)
    return P, M, O, overflow


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
