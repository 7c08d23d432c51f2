"""Device-side LZ4 block compression: detect + match + parse + emit.

Completes the on-device compression pipeline, rebuilt across rounds 4-5
around three measured facts: a ~3-4 ms dispatch floor per launch (fuse stages
into ONE executable), XLA scatter/gather at ~5-11 ns per ELEMENT (size
every scatter by real content, not worst cases), and a data-derived
offset set beating any static candidate tuple (the old matcher scored
the bench text class at ratio 1.00; the detector scores it ~98x).

1. **Offset detection** (``ops/pallas/lz4_match_dyn.detect_offsets``,
   XLA): strided 4-byte sample sort -> per-block top-K repeated deltas,
   halving-refined to the true period.  Blocks with no repeats skip
   match scoring entirely.
2. **Dynamic-offset match scoring** (Pallas): each block loops over its
   own detected offsets; capped log-doubling gives byte-true run
   lengths.
3. **Segment-local greedy parse** (XLA): matches truncate at ``seg``
   boundaries so segments parse independently; an early-exit
   ``lax.while_loop`` jumps the cursor match-to-match (segmented
   reverse-cummin precomputes ``next_match_pos``).  Slot arrays are
   sized ``wcap`` (not the worst case) — a segment overflowing its
   budget keeps its first ``wcap`` sequences and emits the rest as
   literals (a valid, just less compressed, stream).
4. **Byte materialization** (Pallas, ``lz4_emit``): the packed-lane
   kernel scatters per-slot fields through MXU one-hot factors,
   propagates them as key-packed wires by 2D-separable prefix-max, and
   resolves literal bytes with a data-adaptive row loop; it emits LZ4
   or snappy framing (``fmt``).  The XLA materialize (five monotone
   cummax wires + one literal gather) remains the fallback for widths
   the packed wire can't carry.  The emission width is the caller's:
   sized to the compressible blocks' real totals (adaptive mode), not
   the worst-case bound.

The emitted stream is byte-level standard LZ4 (decodable by any LZ4
block decoder; round-trip tests verify against the host codec) and
honors the spec's end-of-block rules: the last 5 bytes are literals and
no match starts within the last 12 bytes.

Reference contrast: bitar ships raw bytes to the DPU DEFLATE engine and
receives compressed frames (``src/device.cc:157-238``) — compression is
offloaded, full stop.  This module is what full offload means on a TPU:
detection, match search, parse, and emission all execute on device; the
host only supplies raw planes and reads back ``(bytes, sizes)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..status import Status, StatusError
from .pallas.lz4_match import DEFAULT_OFFSETS, find_matches

# LZ4 worst-case expansion for an L-byte block (all literals): one token,
# length extensions every 255 bytes, the literals themselves.
def lz4_bound(length: int) -> int:
    return length + length // 255 + 16


def _ext_bytes(v):
    """Number of length-extension bytes for a token field carrying v
    (v = lit_len or match_len - 4): 0 when v < 15, else one byte per
    started 255 beyond the nibble."""
    return jnp.where(v >= 15, (v - 15) // 255 + 1, 0)



def _slot_sizes(taken, lit_len, mv, fmt: str):
    """Per-slot wire size for a (literals, match) sequence in ``fmt``."""
    if fmt == "lz4":
        return jnp.where(
            taken, 1 + _ext_bytes(lit_len) + lit_len + 2 + _ext_bytes(mv), 0)
    # snappy: a literal element (tag + 0-3 little-endian length bytes,
    # snappy.cc:57-66) when lit_len > 0, then one 3-byte copy-2 element
    # per <= 64-byte chunk of the match (tag 2 | (len-1)<<2 + 2 offset
    # bytes, snappy.cc:80-82; matches cap at 1024 so <= 16 chunks).
    n1 = lit_len - 1
    extra = jnp.where(n1 < 60, 0,
                      jnp.where(n1 < 256, 1, jnp.where(n1 < 65536, 2, 3)))
    lit_hdr = jnp.where(lit_len > 0, 1 + extra, 0)
    copies = (mv + 4 + 63) // 64
    return jnp.where(taken, lit_hdr + lit_len + 3 * copies, 0)


def _final_size(final_lit, fmt: str):
    """Wire size of the trailing literals-only element."""
    if fmt == "lz4":
        return 1 + _ext_bytes(final_lit) + final_lit
    n1 = final_lit - 1
    extra = jnp.where(n1 < 60, 0,
                      jnp.where(n1 < 256, 1, jnp.where(n1 < 65536, 2, 3)))
    return jnp.where(final_lit > 0, 1 + extra + final_lit, 0)


def _wire_base(lengths, fmt: str):
    """First slot's output offset: 0 for LZ4; the uncompressed-length
    varint for snappy (1-3 bytes for lengths < 2^21, snappy.cc:26-37)."""
    if fmt == "lz4":
        return jnp.zeros_like(lengths)
    return (1 + (lengths >= (1 << 7)).astype(jnp.int32)
            + (lengths >= (1 << 14)).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("seg", "min_match", "length",
                                              "wcap", "fmt"))
def parse_and_size(mlen, moff, lengths, *, seg: int, min_match: int,
                   length: int, wcap: int | None = 8, fmt: str = "lz4"):
    """Greedy-parse match hints into LZ4 sequences and size the output.

    Args:
      mlen:    [N, L] int32 match length at each position (0 = none).
               Any prefix of a hinted match must be byte-true (the
               matcher guarantees run-exactness), so truncation is safe.
      moff:    [N, L] int32 match distance at each position (>= 1).
      lengths: [N] int32 actual block lengths (<= L; tail blocks).
      seg:     segment size (static); matches never cross a boundary.
      min_match: shortest match worth emitting (>= 4).
      length:  L, the padded block length (static).
      wcap:    max sequences per segment (static).  The slot-array size
               (nseg * wcap) is the UNIT of cost for the emission-wire
               scatters (measured ~0.55 ms/block at the worst-case 86
               slots/segment vs ~0.05 at 8), and on detector-driven
               periodic data real segments carry 1-2 sequences.  A
               segment overflowing wcap keeps its first wcap sequences
               and emits the rest of its bytes as literals — a valid
               (just less compressed) stream whose exact ``total`` the
               caller's size-based RAW check still governs.
               None = the worst-case bound seg//min_match + 1 (never
               overflows; the legacy full-budget parse).

    Returns a dict of device arrays describing the sequence layout
    (inputs to :func:`materialize`), including ``total`` [N] — the
    exact compressed size per block.
    """
    if min_match < 4:
        raise ValueError("LZ4 min_match must be >= 4")
    if seg % 64 or length % seg:
        raise ValueError("seg must be a multiple of 64 and divide length")
    L = length
    n = mlen.shape[0]
    nseg = -(-L // seg)
    i = jnp.arange(L, dtype=jnp.int32)

    # Spec + segment truncation: a match may not cross its segment end,
    # must leave >= 5 trailing literals, and may not start in the last
    # 12 bytes of the block.
    seg_end = ((i // seg) + 1) * seg
    lim = jnp.minimum(seg_end[None, :], lengths[:, None] - 5)
    m = jnp.minimum(mlen, lim - i[None, :])
    valid = (m >= min_match) & (i[None, :] < lengths[:, None] - 12) & (moff >= 1)
    mlen_t = jnp.where(valid, m, 0)

    # Next-match navigation at CHUNK granularity: a full-resolution
    # next_match_pos needs a [N, L] reverse cummin (measured ~6 ms per
    # 256 x 128 KiB — the parse hotspot).  The cursor walk only needs
    # (a) "is there a match AT the cursor" — one gather of the packed
    # plane — and (b) "first match strictly past my 64-byte chunk" — a
    # per-chunk min (ONE full-resolution pass) plus a within-segment
    # reverse cummin over chunks (64x less data).  Matches between the
    # cursor and its chunk end that don't start AT the cursor are
    # skipped (those bytes emit as literals): on detector-driven data a
    # match follows the cursor immediately wherever history >= offset,
    # so the loss is bounded by one sub-chunk literal head per segment.
    CHUNK = 64
    cpseg = seg // CHUNK
    nchunk = L // CHUNK
    cand = jnp.where(valid, i[None, :], L)
    cmin = cand.reshape(n, nchunk, CHUNK).min(axis=2)      # [N, nchunk]
    # Per-segment chunk navigation with an L sentinel column: the walk
    # below gathers SEGMENT-LOCAL slices (operand rows of seg / cpseg+1
    # elements, not L) — the full-plane take_along_axis was the measured
    # parse hotspot (~16 ms per 256 x 128 KiB launch).
    cn3 = lax.associative_scan(
        jnp.minimum, cmin.reshape(n, nseg, cpseg), reverse=True, axis=2)
    cn3 = jnp.concatenate(
        [cn3, jnp.full((n, nseg, 1), L, jnp.int32)], axis=2)
    # One packed side-plane so each walk step pays TWO gathers (XLA TPU
    # gathers carry a large fixed cost): mlen_t fits 11 bits (match cap
    # <= seg <= 1024), moff 16 bits above it.
    pk3 = (mlen_t | (moff.astype(jnp.int32) << 11)).reshape(n, nseg, seg)

    seg_base = (jnp.arange(nseg, dtype=jnp.int32) * seg)[None, :]  # [1, G]
    seg_ends = (jnp.arange(nseg, dtype=jnp.int32) + 1) * seg      # [G]
    worst = seg // min_match + 1
    nstep = worst if wcap is None else min(wcap, worst)

    # Early-exit cursor walk: a lax.while_loop instead of a fixed
    # nstep-long scan — friendly data finishes every segment in a few
    # steps (text/RLE: 1-2 matches per segment), and each step costs two
    # XLA gathers (~11 ns/element), so trip count IS the parse cost.
    # The nstep bound still holds for hostile data (cursor advances >=
    # min_match per taken match or jumps a chunk).
    def cond(carry):
        pos, t, P, M, O = carry
        return jnp.logical_and(t < nstep, (pos < seg_ends[None, :]).any())

    def step(carry):
        pos, t, P, M, O = carry
        loc = pos - seg_base                   # segment-local cursor
        inseg = loc < seg
        pkj = jnp.take_along_axis(
            pk3, jnp.clip(loc, 0, seg - 1)[:, :, None], axis=2)[..., 0]
        mm = jnp.where(inseg, pkj & 0x7FF, 0)
        here = inseg & (mm > 0)
        # No match at the cursor: jump to the first match past the
        # cursor's chunk (within the segment; L = none -> inactive).
        nxt_c = jnp.take_along_axis(
            cn3, jnp.clip((loc >> 6) + 1, 0, cpseg)[:, :, None],
            axis=2)[..., 0]
        jump = jnp.where(inseg & (nxt_c < seg_ends[None, :]), nxt_c, L)
        P = lax.dynamic_update_slice_in_dim(
            P, jnp.where(here, pos, -1)[None], t, axis=0)
        M = lax.dynamic_update_slice_in_dim(
            M, jnp.where(here, mm, 0)[None], t, axis=0)
        O = lax.dynamic_update_slice_in_dim(
            O, jnp.where(here, pkj >> 11, 0)[None], t, axis=0)
        return jnp.where(here, pos + mm, jump), t + 1, P, M, O

    pos0 = jnp.broadcast_to(
        (jnp.arange(nseg, dtype=jnp.int32) * seg)[None, :], (n, nseg))
    rec0 = (jnp.full((nstep, n, nseg), -1, jnp.int32),
            jnp.zeros((nstep, n, nseg), jnp.int32),
            jnp.zeros((nstep, n, nseg), jnp.int32))
    pos_f, _, P, M, O = lax.while_loop(
        cond, step, (pos0, jnp.int32(0)) + rec0)
    # A segment still active after nstep steps had its parse truncated
    # by the wcap budget.  That is a RATIO event, not a correctness
    # event: dropped matches' bytes flow into the next taken sequence's
    # literal run (prev_end tracks taken ends only), so the partial
    # parse is a valid LZ4 stream and ``total`` stays exact — the
    # caller's size-based RAW check still governs incompressible rows.
    # The flag ships as ``layout['truncated']`` for diagnostics.
    overflow = (pos_f < seg_ends[None, :]).any(axis=1)
    # [W, N, G] -> [N, G*W]; (segment, step) order IS position order.
    P = jnp.moveaxis(P, 0, 2).reshape(n, nseg * nstep)
    M = jnp.moveaxis(M, 0, 2).reshape(n, nseg * nstep)
    O = jnp.moveaxis(O, 0, 2).reshape(n, nseg * nstep)

    taken = P >= 0
    ends = jnp.where(taken, P + M, 0)
    cend = lax.associative_scan(jnp.maximum, ends, axis=1)
    prev_end = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), cend[:, :-1]], axis=1)
    lit_len = jnp.where(taken, P - prev_end, 0)
    mv = jnp.where(taken, M - 4, -1)          # -1 marks an empty slot
    sizes = _slot_sizes(taken, lit_len, mv, fmt)

    final_start = cend[:, -1]
    final_lit = lengths - final_start
    size_f = _final_size(final_lit, fmt)

    base = _wire_base(lengths, fmt)[:, None]
    csum = base + jnp.cumsum(sizes, axis=1)
    starts = jnp.concatenate([base, csum], axis=1)      # [N, M+1]
    total = csum[:, -1] + size_f

    # Per-slot fields with the final literals-only sequence appended as
    # slot M (mv = -1 there too, but lit fields are real).
    return dict(
        lit_len=jnp.concatenate([lit_len, final_lit[:, None]], axis=1),
        lit_start=jnp.concatenate([prev_end, final_start[:, None]], axis=1),
        mv=jnp.concatenate([mv, jnp.full((n, 1), -1, jnp.int32)], axis=1),
        off=jnp.concatenate([O, jnp.zeros((n, 1), jnp.int32)], axis=1),
        taken=jnp.concatenate(
            [taken, jnp.ones((n, 1), bool)], axis=1),
        starts=starts,
        total=total,
        nseq=taken.sum(axis=1),
        truncated=overflow,
    )


@functools.partial(jax.jit, static_argnames=("fmt",))
def _layout_from_records(P, M, O, overflow, lengths, fmt: str = "lz4"):
    """Sequence records -> emission layout (the parse_and_size tail).

    P/M/O: [N, nslots] match position / truncated length / offset in
    position order (P = -1 empty), overflow [N] bool, lengths [N].
    Returns the same layout dict as :func:`parse_and_size`.
    """
    n = P.shape[0]
    taken = P >= 0
    ends = jnp.where(taken, P + M, 0)
    cend = lax.associative_scan(jnp.maximum, ends, axis=1)
    prev_end = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), cend[:, :-1]], axis=1)
    lit_len = jnp.where(taken, P - prev_end, 0)
    mv = jnp.where(taken, M - 4, -1)          # -1 marks an empty slot
    sizes = _slot_sizes(taken, lit_len, mv, fmt)

    final_start = cend[:, -1]
    final_lit = lengths - final_start
    size_f = _final_size(final_lit, fmt)

    base = _wire_base(lengths, fmt)[:, None]
    csum = base + jnp.cumsum(sizes, axis=1)
    starts = jnp.concatenate([base, csum], axis=1)      # [N, M+1]
    total = csum[:, -1] + size_f
    return dict(
        lit_len=jnp.concatenate([lit_len, final_lit[:, None]], axis=1),
        lit_start=jnp.concatenate([prev_end, final_start[:, None]], axis=1),
        mv=jnp.concatenate([mv, jnp.full((n, 1), -1, jnp.int32)], axis=1),
        off=jnp.concatenate([O, jnp.zeros((n, 1), jnp.int32)], axis=1),
        taken=jnp.concatenate([taken, jnp.ones((n, 1), bool)], axis=1),
        starts=starts,
        total=total,
        nseq=taken.sum(axis=1),
        truncated=overflow,
    )


@functools.partial(jax.jit, static_argnames=("out_width",))
def materialize(planes, layout, *, out_width: int):
    """Emit the LZ4 byte stream described by ``layout``.

    TPU-shaped: XLA lowers arbitrary cross-lane gathers at a measured
    ~11 ns/element on v5e, so the per-byte sequence lookup is NOT a
    binary search (15 gather rounds = seconds per launch).  Instead the
    per-slot fields scatter once at each sequence's output start (one
    small scatter of ~nseq elements) and a single tuple carry-scan
    ("last set slot wins", associative) propagates them to every output
    byte — scans are log-depth elementwise passes, no gathers.  Header
    bytes (token, length extensions, offset) then compute arithmetically
    per byte; only the literal payload needs a data gather from the raw
    plane.

    Scatter cost is per SLOT (nseg * wcap per block), so the wires pack
    into THREE words when they fit (out_width <= 8192: lit_len <= 13
    bits for any emitted block since total >= lit_len; match cap <= 1026
    so mv+1 <= 10 bits — the parse's seg <= 1024 guarantees it), else
    the general five-wire form.

    planes: [N, L] uint8 raw bytes.  Returns [N, out_width] uint8; bytes
    past ``layout['total'][b]`` are zero.  Blocks whose total exceeds
    ``out_width`` produce garbage rows — the caller's fallback contract
    (size >= raw length or > out_width -> store RAW) must drop them."""
    n, L = planes.shape
    starts = layout["starts"]          # [N, M+1] slot output starts
    nslots = starts.shape[1]
    OW = out_width

    # Scatter per-slot fields at their output start byte.  Empty slots
    # (size 0) share a start with the next real slot; dropping them
    # leaves exactly one writer per cell.  ``sizes`` of slot k =
    # starts[k+1] - starts[k] for k < M; the final slot (index M) is
    # always real.
    sizes = jnp.diff(starts, axis=1)
    real = jnp.concatenate(
        [sizes > 0, jnp.ones((n, 1), bool)], axis=1)      # [N, M+1]
    idx = jnp.where(real & (starts < OW), starts, OW)     # OW = dropped
    bidx = jnp.broadcast_to(jnp.arange(n)[:, None], idx.shape)

    def wire(field, fill=0):
        w = jnp.full((n, OW + 1), fill, jnp.int32)
        w = w.at[bidx, idx].set(field, mode="drop")
        return w[:, :OW]

    # Propagation is native cummax scans, not a generic carry-scan:
    # output starts strictly increase across real slots, so any field
    # packed under a monotone key ``key << k | field`` propagates with
    # MAX ("later slot wins").  Monotone keys: s1 (start+1), lit_start,
    # and the slot index k1.
    mv1 = jnp.where(layout["mv"] >= 0, layout["mv"] + 1, 0)
    off = layout["off"]
    s1 = starts + 1
    # Slot INDEX (15 bits at any practical M) keys the off scan so the
    # full 16-bit offset rides one word; mv packs under s1 (<= 2^18).
    # EngineConfig.validate (device_matcher_slots) rejects configs that
    # reach this at config time; direct callers get the same Status.
    if nslots >= (1 << 15):
        raise StatusError(Status.Invalid(
            f"too many sequence slots ({nslots}) to pack (>= 2^15); "
            f"raise min_match or shrink seg/block"))
    k1 = jnp.broadcast_to(
        jnp.arange(1, nslots + 1, dtype=jnp.int32)[None, :], starts.shape)
    t = jnp.broadcast_to(jnp.arange(OW, dtype=jnp.int32)[None, :], (n, OW))
    if OW <= 8192:
        # Compact three-wire form: lit_len clamps to 13 bits (only
        # garbage-row slots exceed OW; emitted blocks have ll <= total
        # <= OW) and mv1 <= 1022 (seg <= 1024 caps match length).
        ll_c = jnp.minimum(layout["lit_len"], 0x1FFF)
        w_a = lax.cummax(wire((s1 << 13) | ll_c), axis=1)
        w_b = lax.cummax(
            wire((layout["lit_start"] << 10) | jnp.minimum(mv1, 0x3FF)),
            axis=1)
        w_c = lax.cummax(wire((k1 << 16) | off), axis=1)
        w_start = lax.shift_right_logical(w_a, 13)
        ll = w_a & 0x1FFF
        w_ls = lax.shift_right_logical(w_b, 10)
        mv = (w_b & 0x3FF) - 1
        off = w_c & 0xFFFF
    else:
        w_start = lax.cummax(wire(s1), axis=1)
        w_ls = lax.cummax(wire(layout["lit_start"]), axis=1)
        w_le = lax.cummax(
            wire(layout["lit_start"] + layout["lit_len"]), axis=1)
        w_off = lax.cummax(wire((k1 << 16) | off), axis=1)
        w_mv = lax.cummax(wire((s1 << 11) | mv1), axis=1)
        ll = w_le - w_ls
        off = w_off & 0xFFFF
        mv = (w_mv & 0x7FF) - 1
    d = t - (w_start - 1)

    n_lit_ext = _ext_bytes(ll)
    hdr = 1 + n_lit_ext
    lit_end = hdr + ll

    token = (jnp.minimum(ll, 15) << 4) | jnp.where(
        mv >= 0, jnp.minimum(mv, 15), 0)
    lit_ext = jnp.clip(ll - 15 - 255 * (d - 1), 0, 255)
    lit_idx = jnp.clip(w_ls + (d - hdr), 0, L - 1)
    lit_byte = jnp.take_along_axis(planes, lit_idx, axis=1).astype(jnp.int32)
    off_byte = jnp.where(d == lit_end, off & 0xFF, (off >> 8) & 0xFF)
    m_ext = jnp.clip(mv - 15 - 255 * (d - lit_end - 2), 0, 255)

    val = jnp.where(
        d == 0, token,
        jnp.where(d < hdr, lit_ext,
                  jnp.where(d < lit_end, lit_byte,
                            jnp.where(d < lit_end + 2, off_byte, m_ext))))
    val = jnp.where(t < layout["total"][:, None], val, 0)
    return val.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=(
    "seg", "min_match", "mm", "detect_k", "interpret", "offsets", "wcap",
    "detect_fft", "fmt", "fft_k"))
def _match_parse(planes, lengths, *, seg, min_match, mm, detect_k,
                 interpret, offsets, wcap=8, detect_fft=False, fmt="lz4",
                 fft_k=2):
    """Fused match + parse: ONE XLA executable (one dispatch — the dev
    tunnel charges ~3-4 ms per launch regardless of work, measured
    2026-08-19, so stage-per-launch composition dominates small-batch
    cost)."""
    n, L = planes.shape
    nrows = L // 128
    if offsets is not None:
        mlen, moff = find_matches(
            planes.reshape(n, nrows, 128), offsets=offsets, nrows=nrows,
            interpret=interpret, max_match=mm, emit_values=True)
    else:
        from .pallas.lz4_match_dyn import (detect_offsets,
                                           detect_offsets_fft,
                                           find_matches_dyn,
                                           find_matches_parse_dyn)
        offs, _cnt = detect_offsets(
            planes, k=detect_k, max_off=min(0xFFFF, L - 128))
        if detect_fft:
            # FFT autocorrelation candidates catch periods the sampled
            # grid cannot see (non-stride-multiple large periods);
            # duplicates of a sampled candidate zero out so they don't
            # burn matcher iterations.  detect_fft="sample" runs the
            # rfft on 8 evenly-spaced blocks only (~1/32 of the cost)
            # and broadcasts the deduped union of their lags to every
            # block — corpus-wide periods (tiled text, fixed-width
            # records) cost one wasted matcher slot per junk lag, and
            # the match kernel verifies byte equality per block either
            # way.  Heterogeneous corpora should use detect_fft=True.
            if detect_fft == "sample":
                step = max(1, n // 8)
                foffs_s, _ = detect_offsets_fft(
                    planes[::step][:8], k=fft_k,
                    max_off=min(0xFFFF, L - 128))
                cand = foffs_s.reshape(-1)
                eq = cand[None, :] == cand[:, None]
                first = (jnp.argmax(eq, axis=0)
                         == jnp.arange(cand.shape[0]))
                cand = jnp.where(first, cand, 0)
                foffs = jnp.broadcast_to(cand[None, :], (n, cand.shape[0]))
            else:
                foffs, _ = detect_offsets_fft(
                    planes, k=fft_k, max_off=min(0xFFFF, L - 128))
            dup = (foffs[:, :, None] == offs[:, None, :]).any(axis=2)
            foffs = jnp.where(dup, 0, foffs)
            offs = jnp.concatenate([offs, foffs], axis=1)
            # Compact nonzero offsets to the front: the matcher loops
            # the first ``noff`` slots only.
            order = jnp.argsort(offs == 0, axis=1, stable=True)
            offs = jnp.take_along_axis(offs, order, axis=1)
        noff = (offs > 0).sum(axis=1).astype(jnp.int32)
        # Detector-driven parses carry 1-2 sequences per segment; wcap=8
        # keeps the slot arrays small, with dense-sequence blocks
        # falling back RAW.  Match scoring AND the greedy cursor walk
        # run fused in ONE Pallas dispatch (the [N, L] match planes
        # never round-trip HBM; the old XLA walk's per-iteration gather
        # scanned the whole operand at ~8.6 ms/iteration, and the
        # standalone walk kernel paid 7.3 ms of seg-major transposes).
        if (seg % 128 == 0 and L % seg == 0 and L // seg <= 128
                and mm <= seg and 8 <= seg // 128):
            P, M, O, overflow = find_matches_parse_dyn(
                planes.reshape(n, nrows, 128), noff, offs, lengths,
                nrows=nrows, seg=seg, min_match=min_match, wcap=wcap,
                max_match=mm, interpret=interpret)
            return _layout_from_records(P, M, O, overflow, lengths,
                                        fmt=fmt)
        mlen, moff = find_matches_dyn(
            planes.reshape(n, nrows, 128), noff, offs, nrows=nrows,
            max_match=mm, interpret=interpret)
        return parse_and_size(
            mlen.reshape(n, L), moff.reshape(n, L), lengths,
            seg=seg, min_match=min_match, length=L, wcap=wcap, fmt=fmt)
    # The legacy static-offset path keeps the worst-case budget (its
    # tests exercise dense parses).
    return parse_and_size(
        mlen.reshape(n, L), moff.reshape(n, L), lengths,
        seg=seg, min_match=min_match, length=L, wcap=None, fmt=fmt)


@functools.partial(jax.jit, static_argnames=(
    "seg", "min_match", "mm", "detect_k", "interpret", "offsets",
    "out_width", "wcap", "detect_fft", "fmt", "fft_k"))
def _pipeline(planes, lengths, *, seg, min_match, mm, detect_k, interpret,
              offsets, out_width, wcap=8, detect_fft=False, fmt="lz4",
              fft_k=2):
    """Fully fused compress pipeline (explicit emission width): detect +
    match + parse + materialize in one dispatch."""
    layout = _match_parse(planes, lengths, seg=seg, min_match=min_match,
                          mm=mm, detect_k=detect_k, interpret=interpret,
                          offsets=offsets, wcap=wcap,
                          detect_fft=detect_fft, fmt=fmt, fft_k=fft_k)
    out = _emit(planes, layout, out_width=out_width, interpret=interpret,
                fmt=fmt, lengths=lengths)
    return out, layout["total"]


def _emit(planes, layout, *, out_width: int, interpret: bool,
          fmt: str = "lz4", lengths=None):
    """Emission dispatch: the packed-lane Pallas kernel when the wire
    ranges fit (ll/off 16-bit, ls 17-bit, start key < 2^16, lane-tiled
    width); the windowed broadcast kernel for non-128-multiple widths;
    the XLA materialize otherwise (wide emission planes)."""
    L = planes.shape[1]
    if out_width < (1 << 16) and L <= (1 << 17) and L % 128 == 0 \
            and out_width % 128 == 0 and out_width >= 256:
        # >= 256: a single-row output (R = 1) fails Mosaic's gather
        # lowering; the windowed kernel covers ow = 128.
        from .pallas.lz4_emit import materialize_pallas_packed
        return materialize_pallas_packed(
            planes, layout, out_width=out_width, interpret=interpret,
            fmt=fmt, lengths=lengths)
    if fmt != "lz4":
        raise StatusError(Status.Invalid(
            f"snappy device emission needs a lane-tiled out_width in "
            f"[256, 65536) (got {out_width})"))
    if out_width < (1 << 16) and L <= (1 << 17) and L % 128 == 0 \
            and out_width % 8 == 0:
        from .pallas.lz4_emit import materialize_pallas
        return materialize_pallas(planes, layout, out_width=out_width,
                                  interpret=interpret)
    return materialize(planes, layout, out_width=out_width)


def _validate_args(L, seg, mm, offsets):
    if L % 128:
        raise StatusError(Status.Invalid("plane width must be lane-aligned"))
    # Packing-width invariants (StatusError, not silent corruption): the
    # emission layout carries match lengths in 11-bit fields (mlen/mv)
    # and offsets in 16 bits.
    if mm > 2047:
        raise StatusError(Status.Invalid(
            f"max_match {mm} overflows the 11-bit emission field (> 2047)"))
    if offsets is not None:
        bad_off = [d for d in offsets if not (1 <= d <= 0xFFFF)]
        if bad_off:
            raise StatusError(Status.Invalid(
                f"match offsets {bad_off[:4]} outside [1, 65535] (16-bit "
                f"emission field / LZ4 distance)"))


def match_parse_device(planes, lengths, *, seg: int = 1024,
                       min_match: int = 6,
                       offsets: tuple[int, ...] | None = None,
                       max_match: int | None = None,
                       detect_k: int = 4,
                       interpret: bool = False,
                       detect_fft: bool = False,
                       fmt: str = "lz4",
                       fft_k: int = 2):
    """Match + parse stages of full-offload compression (no emission).

    Returns the sequence ``layout`` dict from :func:`parse_and_size`;
    ``layout['total']`` is the exact per-block compressed size, so a
    caller can size the emission plane (``materialize``) from a tiny
    readback of it — or skip emission entirely for incompressible
    blocks.

    ``offsets=None`` (default) derives each block's candidate offsets
    from the data (``lz4_match_dyn.detect_offsets``); a static tuple
    forces the legacy fixed-candidate kernel (``lz4_match``).
    """
    planes = jnp.asarray(planes)
    n, L = planes.shape
    mm = max_match if max_match is not None else min(seg, 1024)
    _validate_args(L, seg, mm, offsets)
    return _match_parse(planes, jnp.asarray(lengths, jnp.int32), seg=seg,
                        min_match=min_match, mm=mm, detect_k=detect_k,
                        interpret=interpret, offsets=offsets,
                        detect_fft=detect_fft, fmt=fmt, fft_k=fft_k)


def compress_blocks_device(planes, lengths, *, seg: int = 1024,
                           min_match: int = 6,
                           offsets: tuple[int, ...] | None = None,
                           max_match: int | None = None,
                           out_width: int | None = None,
                           interpret: bool = False,
                           detect_k: int = 4,
                           wcap: int = 8,
                           detect_fft: bool = False,
                           fmt: str = "lz4",
                           fft_k: int = 2):
    """Full on-device LZ4 compression of a batch of blocks.

    Args:
      planes:  [N, L] uint8 device (or host) raw byte planes, zero-padded
               past each block's ``lengths[b]``.
      lengths: [N] int32 actual block lengths.
      seg:     parse segment size; also the match-length cap.
      offsets: static candidate offsets (legacy kernel); None = derive
               per-block offsets from the data (the default).
      out_width: emission plane width.  None = adaptive: read back the
               (tiny) size vector and emit at the smallest lane-tiled
               power-of-two width covering every COMPRESSIBLE block —
               emission cost scales with compressed bytes, not the LZ4
               worst-case bound (measured 154 ms -> ~2 ms per 64 x 128
               KiB launch on friendly data).  An explicit width keeps
               the call single-launch (no readback); rows with
               ``sizes[b] > out_width`` then contain garbage and MUST be
               treated as fallback by the caller.

    Returns ``(out [N, W] uint8, sizes [N] int32)`` — standard LZ4
    block bytes per row.  Rows whose size >= lengths[b] (or >
    out_width) should be stored RAW by the caller (the engine's
    incompressible escape, reference ``config.cc:60-73``).
    """
    planes = jnp.asarray(planes)
    n, L = planes.shape
    mm = max_match if max_match is not None else min(seg, 1024)
    _validate_args(L, seg, mm, offsets)
    lengths = jnp.asarray(lengths, jnp.int32)
    if out_width is not None and out_width <= 8192 and mm > 1026:
        raise StatusError(Status.Invalid(
            f"max_match {mm} overflows the compact emission wire "
            f"(requires out_width > 8192 or max_match <= 1026)"))
    if out_width is not None:
        # Single fused dispatch (see _match_parse: ~3-4 ms/launch floor).
        return _pipeline(planes, lengths, seg=seg, min_match=min_match,
                         mm=mm, detect_k=detect_k, interpret=interpret,
                         offsets=offsets, out_width=out_width, wcap=wcap,
                         detect_fft=detect_fft, fmt=fmt, fft_k=fft_k)
    layout = _match_parse(planes, lengths, seg=seg, min_match=min_match,
                          mm=mm, detect_k=detect_k, interpret=interpret,
                          offsets=offsets, wcap=wcap, detect_fft=detect_fft,
                          fmt=fmt, fft_k=fft_k)
    sizes = np.asarray(layout["total"])
    lens = np.asarray(lengths)
    good = sizes < lens
    wmax = int(sizes[good].max(initial=128))
    if mm > 1026:
        wmax = max(wmax, 8193)   # compact wire can't carry this mv
    width = 128 << max(0, (-(-wmax // 128) - 1).bit_length())
    width = min(width, -(-lz4_bound(L) // 128) * 128)
    out = _emit(planes, layout, out_width=width, interpret=interpret,
                fmt=fmt, lengths=lengths)
    return out, layout["total"]
