"""Device-side LZ4 block compression: parallel parse + byte emission.

Completes the on-device compression pipeline.  The Pallas matcher
(``ops/pallas/lz4_match.py``) scores a match at every byte position; this
module turns those per-position ``(length, offset)`` hints into a
standard LZ4 block byte stream *without leaving the device*:

1. **Segment-local greedy parse.**  Each block splits into ``seg``-byte
   segments; matches are truncated at segment boundaries, so every
   segment parses independently.  The parse itself is a short
   ``lax.scan``: the cursor jumps straight to the next valid match (a
   reverse cumulative min precomputes ``next_match_pos``), so at most
   ``seg // min_match + 1`` steps cover a segment — each step is three
   tiny batched gathers, not a byte-at-a-time walk.
2. **Global sequence assembly.**  Flattened ``(segment, step)`` records
   are position-ordered by construction; a cumulative max of match ends
   yields every sequence's literal run, closed-form LZ4 sizes (token +
   extension bytes + literals + offset) feed an exclusive scan for the
   output layout.  Literal runs spanning segment boundaries merge
   naturally because literals are *derived* (gaps between matches), not
   parsed.
3. **Byte materialization (gather-pull).**  Every output byte finds its
   sequence by binary search over the start offsets and computes itself
   branchlessly: token, length-extension bytes, a literal gather from
   the raw plane, or an offset byte.  A pull formulation — one gather
   per output byte — is the TPU-friendly shape; there are no scatters
   anywhere in the pipeline.

The emitted stream is byte-level standard LZ4 (decodable by any LZ4
block decoder; round-trip tests verify against the host codec) and
honors the spec's end-of-block rules: the last 5 bytes are literals and
no match starts within the last 12 bytes.

Reference contrast: bitar ships raw bytes to the DPU DEFLATE engine and
receives compressed frames (``src/device.cc:157-238``) — compression is
offloaded, full stop.  This module is what full offload means on a TPU:
match search (Pallas), parse, and emission all execute on device; the
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


@functools.partial(jax.jit, static_argnames=("seg", "min_match", "length"))
def parse_and_size(mlen, moff, lengths, *, seg: int, min_match: int,
                   length: int):
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

    Returns a dict of device arrays describing the sequence layout
    (inputs to :func:`materialize`), including ``total`` [N] — the
    exact compressed size per block.
    """
    if min_match < 4:
        raise ValueError("LZ4 min_match must be >= 4")
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

    # next_match_pos[p] = smallest q >= p with a valid match (else L).
    cand = jnp.where(valid, i[None, :], L)
    nmp = lax.associative_scan(jnp.minimum, cand, reverse=True, axis=1)
    nmp = jnp.concatenate([nmp, jnp.full((n, 1), L, jnp.int32)], axis=1)
    # One packed side-plane so each scan step pays TWO gathers (XLA TPU
    # gathers carry a large fixed cost; measured 0.2 ms each even at
    # [N, nseg]): mlen_t fits 11 bits (match cap <= seg <= 1024), moff
    # 16 bits above it.
    pk = mlen_t | (moff.astype(jnp.int32) << 11)
    pk_p = jnp.concatenate([pk, jnp.zeros((n, 1), jnp.int32)], axis=1)

    seg_ends = (jnp.arange(nseg, dtype=jnp.int32) + 1) * seg      # [G]
    nstep = seg // min_match + 1

    def step(pos, _):
        j = jnp.take_along_axis(nmp, jnp.minimum(pos, L), axis=1)
        active = j < seg_ends[None, :]
        jc = jnp.minimum(j, L)
        pkj = jnp.take_along_axis(pk_p, jc, axis=1)
        mm = pkj & 0x7FF
        oo = pkj >> 11
        rec = (jnp.where(active, j, -1),
               jnp.where(active, mm, 0),
               jnp.where(active, oo, 0))
        return jnp.where(active, j + mm, L), rec

    pos0 = jnp.broadcast_to(
        (jnp.arange(nseg, dtype=jnp.int32) * seg)[None, :], (n, nseg))
    _, (P, M, O) = lax.scan(step, pos0, None, length=nstep)
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
    sizes = jnp.where(
        taken, 1 + _ext_bytes(lit_len) + lit_len + 2 + _ext_bytes(mv), 0)

    final_start = cend[:, -1]
    final_lit = lengths - final_start
    size_f = 1 + _ext_bytes(final_lit) + final_lit

    csum = jnp.cumsum(sizes, axis=1)
    starts = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), csum], axis=1)   # [N, M+1]
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

    planes: [N, L] uint8 raw bytes.  Returns [N, out_width] uint8; bytes
    past ``layout['total'][b]`` are zero."""
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

    # Propagation is six native cummax scans, not a generic carry-scan:
    # output starts strictly increase across real slots, so any field
    # packed under a ``(start+1) << k | field`` key propagates with MAX
    # ("later slot wins"), and two fields — lit_start and the literal
    # run's end (the match position; ``lengths`` for the final slot) —
    # are themselves monotone across slots and scan bare.  lit_len
    # derives as (run_end - lit_start), so no 18-bit field ever needs
    # packing next to the 18-bit start.
    mv1 = jnp.where(layout["mv"] >= 0, layout["mv"] + 1, 0)   # 11 bits
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
    w_start = lax.cummax(wire(s1), axis=1)
    w_ls = lax.cummax(wire(layout["lit_start"]), axis=1)
    w_le = lax.cummax(wire(layout["lit_start"] + layout["lit_len"]), axis=1)
    w_off = lax.cummax(wire((k1 << 16) | off), axis=1)
    w_mv = lax.cummax(wire((s1 << 11) | mv1), axis=1)

    t = jnp.broadcast_to(jnp.arange(OW, dtype=jnp.int32)[None, :], (n, OW))
    d = t - (w_start - 1)
    ll = w_le - w_ls
    off = w_off & 0xFFFF
    mv = (w_mv & 0x7FF) - 1

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


def compress_blocks_device(planes, lengths, *, seg: int = 512,
                           min_match: int = 6,
                           offsets: tuple[int, ...] = DEFAULT_OFFSETS,
                           max_match: int | None = None,
                           out_width: int | None = None,
                           interpret: bool = False):
    """Full on-device LZ4 compression of a batch of blocks.

    Args:
      planes:  [N, L] uint8 device (or host) raw byte planes, zero-padded
               past each block's ``lengths[b]``.
      lengths: [N] int32 actual block lengths.
      seg:     parse segment size; also the match-length cap.
      offsets: candidate match distances for the Pallas matcher.

    Returns ``(out [N, out_width] uint8, sizes [N] int32)`` — standard
    LZ4 block bytes per row.  Rows whose size >= lengths[b] should be
    stored RAW by the caller (the engine's incompressible escape,
    reference ``config.cc:60-73``).
    """
    planes = jnp.asarray(planes)
    n, L = planes.shape
    if L % 128:
        raise StatusError(Status.Invalid("plane width must be lane-aligned"))
    nrows = L // 128
    mm = max_match if max_match is not None else min(seg, 512)
    # Packing-width invariants (StatusError, not silent corruption): the
    # emission layout carries match lengths in 11-bit fields (mlen/mv)
    # and offsets in 16 bits.
    if mm > 2047:
        raise StatusError(Status.Invalid(
            f"max_match {mm} overflows the 11-bit emission field (> 2047)"))
    bad_off = [d for d in offsets if not (1 <= d <= 0xFFFF)]
    if bad_off:
        raise StatusError(Status.Invalid(
            f"match offsets {bad_off[:4]} outside [1, 65535] (16-bit "
            f"emission field / LZ4 distance)"))
    mlen, moff = find_matches(
        planes.reshape(n, nrows, 128), offsets=offsets, nrows=nrows,
        interpret=interpret, max_match=mm, emit_values=True)
    moff = moff.reshape(n, L)
    layout = parse_and_size(
        mlen.reshape(n, L), moff, jnp.asarray(lengths, jnp.int32),
        seg=seg, min_match=min_match, length=L)
    width = out_width if out_width is not None else -(-lz4_bound(L) // 128) * 128
    out = materialize(planes, layout, out_width=width)
    return out, layout["total"]
