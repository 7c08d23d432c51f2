"""Pallas LZ4 byte-emission kernels (the materialize stage on-chip).

Emits the standard LZ4 byte stream for a batch of blocks from the
sequence layout (``device_compress.parse_and_size`` /
``_layout_from_records``).  Two generations live here:

- ``materialize_pallas_packed`` (the dispatch default for lane-tiled
  widths): output bytes PACKED one per (sublane, lane) cell — slot
  fields scatter through two one-hot factors on the MXU, propagate as
  key-packed wires by 2D-separable prefix-max, and literals resolve
  with a data-adaptive row loop.  Measured: 2.0 ms per 256 x 128 KiB
  at OW=2048 (the windowed kernel's broadcast output cost 128x the
  VPU work: 4.7 ms there, 78 ms at the 48 KiB text width vs 6.0).
- ``materialize_pallas`` (windowed, for %8 widths): output bytes on
  sublanes broadcast across lanes, with MXU slot compaction and
  per-tile slot windows.

The XLA materialize (``device_compress.materialize``) remains the
fallback above 64 KiB widths.  The windowed design:

1. **MXU slot compaction** (``_compact_kernel``): the layout's slot
   array is (segment, step)-shaped and ~7/8 empty (unused walk steps).
   Ranks come from an XLA cumsum; the kernel builds the permutation
   one-hot ``QT[new, old] = (new == rank[old])`` with one iota/lane
   compare and compacts every per-slot byte row with ONE int8 matmul.
   An XLA take_along_axis compaction measured ~2.2 ms per gathered
   row (cross-lane gathers are operand-proportional); this is one
   21-MMAC matmul per block.
2. **Slot one-hot by interval test** — no rank scan: output byte t
   belongs to slot k iff ``starts[k] <= t < starts[k] + sizes[k]``,
   two broadcast compares.  Slots on LANES, output bytes on ROWS.
3. **Per-tile slot windows**: compacted real slots own >= 3 output
   bytes each (token + 2-byte offset minimum; tail >= 1), so a
   512-byte output tile intersects < 174 slots.  The emission grid is
   (block, tile) and a scalar-prefetch index map hands each step a
   3 x 128-slot window — the one-hot shrinks from [OW, s_pad] to
   [512, 384] (the full-width one-hot build dominated the kernel).
4. **MXU field gather** — per-byte slot fields come from ONE int8
   matmul of the one-hot against the byte-decomposed fields; all
   field operands stay LANE-major end-to-end (the natural layout of
   the layout arrays — contracting lanes-with-lanes on the MXU avoids
   every host/XLA transpose).
5. **MXU literal gather** — the literal byte's plane row is selected
   with a second one-hot matmul over the raw plane's rows; the lane
   lands with one in-tile dynamic-lane gather.

Everything keeps output bytes on SUBLANES ([TW, ...] planes, value
broadcast across lanes; the caller slices lane 0), so no transposes or
cross-tile reshapes appear anywhere.

Hardware note: single-lane int32 slice chains narrow to 16 bits on
v5e Mosaic (observed: ``gf[:, 6:7] << 16`` evaluates to 0 on silicon
while interpret mode and full-width shifts are exact), so no gathered
field may recombine to >= 2^16 — lit_start ships as a (row, lane)
pair and the literal index carry runs in row/lane space.

Reference contrast: this is the byte-assembly half of what bitar's DPU
does in hardware after its match search (``src/device.cc:157-238``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

#: slot-window width in 128-slot tiles: 127 (alignment slack) + 512/3
#: + boundary slots < 384, so a 3-tile window always covers every slot
#: a 512-byte output tile can intersect (compacted slots are >= 3
#: bytes each; the tail >= 1).
WIN_TILES = 3

#: bundle rows: 0-1 start bytes, 2-3 lit_len, 4-5 lit_start>>7,
#: 6 lit_start&127, 7-8 mv+1, 9-10 offset, 11-12 end bytes.
_BUNDLE_ROWS = 13


def _compact_kernel(bundle_ref, rank_ref, out_ref, *, s_pad):
    """Permute slot byte-columns so real slots pack to the front.

    bundle_ref (1, 32, s_pad) int8: per-slot field bytes, lane-major.
    rank_ref (1, 8, s_pad) int32: row 0 = target index per slot (-1
    for empty slots — matches no target, so empty targets stay zero:
    start == end == 0, an empty interval).
    """
    rank = rank_ref[0, 0:1, :]                       # [1, s_pad]
    new_i = lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)
    qt = (new_i == rank).astype(jnp.int8)            # [new, old]
    out_ref[0] = jax.lax.dot_general(
        bundle_ref[0], qt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.int8)


def _emit_kernel(total_ref, win_ref, plane_ref, rest, *, tw, nrows, win):
    """One grid step emits one tw-byte output tile of one block.

    total_ref (N,) SMEM      exact compressed size per block
    win_ref  (N, ntiles) SMEM  slot-window base (in 128-slot tiles)
    plane_ref (1, nrows, 128) VMEM uint8 raw plane (natural layout)
    rest: ``win`` bundle windows (1, 32, 128) int8 (see _BUNDLE_ROWS)
          then the output ref (1, tw, 128) uint8 (byte value broadcast
          across lanes; the caller slices lane 0).
    """
    bw_refs = rest[:win]
    out_ref = rest[win]
    b = pl.program_id(0)
    j = pl.program_id(1)
    t_col = j * tw + lax.broadcasted_iota(jnp.int32, (tw, 1), 0)

    bw = jnp.concatenate([r[0] for r in bw_refs], axis=1)  # [32, 128*win]
    bw32 = bw.astype(jnp.int32) & 0xFF
    starts = bw32[0:1, :] + (bw32[1:2, :] << 8)      # [1, 128*win]
    ends = bw32[11:12, :] + (bw32[12:13, :] << 8)
    # One-hot by interval test: empty slots have ends == starts.
    oh = jnp.logical_and(starts <= t_col, t_col < ends).astype(jnp.int8)
    # Field gather: one int8 matmul, contracting lanes with lanes (the
    # field operand is lane-major; the MXU takes the transposed RHS).
    gf = jax.lax.dot_general(
        oh, bw[:16],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)            # [tw, 16]

    def gcol(c0, nbytes):
        # One-hot rows gather a single signed byte; mask to unsigned.
        # HW CONSTRAINT: every recombined field must stay < 2^16 (the
        # module-docstring Mosaic narrowing) — no field has a third
        # byte; lit_start is carried as (row, lane) below.
        v = gf[:, c0:c0 + 1] & 0xFF
        for j2 in range(1, nbytes):
            v = v + ((gf[:, c0 + j2:c0 + j2 + 1] & 0xFF) << (8 * j2))
        return v                                     # [tw, 1]

    w_start = gcol(0, 2)
    ll = gcol(2, 2)
    ls_row = gcol(4, 2)                              # lit_start >> 7
    ls_lane = gcol(6, 1)                             # lit_start & 127
    mv = gcol(7, 2) - 1
    off = gcol(9, 2)

    d = t_col - w_start
    n_lit_ext = jnp.where(ll >= 15, (ll - 15) // 255 + 1, 0)
    hdr = 1 + n_lit_ext
    lit_end = hdr + ll

    token = (jnp.minimum(ll, 15) << 4) | jnp.where(
        mv >= 0, jnp.minimum(mv, 15), 0)
    lit_ext = jnp.clip(ll - 15 - 255 * (d - 1), 0, 255)
    m_ext = jnp.clip(mv - 15 - 255 * (d - lit_end - 2), 0, 255)
    off_byte = jnp.where(d == lit_end, off & 0xFF, (off >> 8) & 0xFF)

    # Literal byte: row one-hot matmul over the raw plane, then an
    # in-tile dynamic-lane pick of the byte within the row.  The
    # literal index is carried as (row, lane) with an explicit lane
    # carry so every intermediate stays < 2^16 (see gcol note).
    lane_sum = ls_lane + (d - hdr)                   # [-tw, 127 + tw]
    lit_row = jnp.clip(ls_row + (lane_sum >> 7), 0, nrows - 1)
    r_lane = lax.broadcasted_iota(jnp.int32, (1, nrows), 1)
    oh2 = (r_lane == lit_row).astype(jnp.int8)              # [tw, nrows]
    plane_b = (plane_ref[0].astype(jnp.int32) - 128).astype(jnp.int8)
    rowsel = jax.lax.dot_general(
        oh2, plane_b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [tw, 128]
    lane_idx = jnp.broadcast_to(lane_sum & 127, (tw, LANES))
    lit_byte = jnp.take_along_axis(rowsel, lane_idx, axis=1)[:, :1] + 128

    val = jnp.where(
        d == 0, token,
        jnp.where(d < hdr, lit_ext,
                  jnp.where(d < lit_end, lit_byte,
                            jnp.where(d < lit_end + 2, off_byte, m_ext))))
    val = jnp.where(t_col < total_ref[b], val, 0)
    out_ref[0] = jnp.broadcast_to(val, (tw, LANES)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_width", "interpret"))
def materialize_pallas(planes, layout, *, out_width: int,
                       interpret: bool = False):
    """Pallas emission of the LZ4 stream described by ``layout``.

    Same contract as ``device_compress.materialize``: planes [N, L]
    uint8, returns [N, out_width] uint8 (zeros past ``total``; rows
    whose total exceeds out_width are garbage — the caller's RAW
    fallback drops them).  Requires lit_len/lit_start/mv/off field
    ranges of a real emission (ll < 2^16, ls < 2^17 = 128 KiB blocks,
    mv < 2^15, off < 2^16).  Emitted starts/ends must fit 16 bits, so
    out_width <= 65535 (the engine uses <= 8192)."""
    n, L = planes.shape
    ow = out_width
    nrows = L // LANES
    starts = layout["starts"]                       # [N, S]
    nslots = starts.shape[1]
    s_pad = -(-nslots // LANES) * LANES
    s_tiles = s_pad // LANES
    tw = 512 if (ow % 512 == 0 and ow > 512) else ow
    ntiles = ow // tw
    win = min(WIN_TILES, s_tiles) if ntiles > 1 else s_tiles

    sizes = jnp.diff(starts, axis=1)
    sizes = jnp.concatenate(
        [sizes, jnp.maximum(layout["total"][:, None] - starts[:, -1:], 0)],
        axis=1)
    # Clamp to the wire ranges (only garbage rows exceed them; their
    # bytes are dropped by the caller's fallback contract).
    st_c = jnp.clip(starts, 0, ow)
    ends_c = jnp.clip(starts + sizes, 0, ow)
    ll_c = jnp.minimum(layout["lit_len"], 0xFFFF)
    ls_c = jnp.clip(layout["lit_start"], 0, (1 << 17) - 1)
    mv1 = jnp.clip(jnp.where(layout["mv"] >= 0, layout["mv"] + 1, 0),
                   0, 0x7FFF)
    off_c = jnp.clip(layout["off"], 0, 0xFFFF)

    real = sizes > 0
    # Compaction rank: real slots keep position order; empties map
    # nowhere (-1) so their compacted targets stay all-zero — an
    # empty [0, 0) interval.
    rank = jnp.where(real, jnp.cumsum(real, axis=1).astype(jnp.int32) - 1,
                     -1)
    rank8 = jnp.pad(rank[:, None, :], ((0, 0), (0, 7), (0, s_pad - nslots)),
                    constant_values=-1)

    def bts(v, c):
        return [((v >> (8 * j)) & 0xFF).astype(jnp.int8) for j in range(c)]

    rows = (bts(st_c, 2) + bts(ll_c, 2) + bts(ls_c >> 7, 2)
            + bts(ls_c & 127, 1) + bts(mv1, 2) + bts(off_c, 2)
            + bts(ends_c, 2))
    bundle = jnp.stack(rows, axis=1)                # [N, 13, S] lane-major
    bundle = jnp.pad(bundle, ((0, 0), (0, 32 - _BUNDLE_ROWS),
                              (0, s_pad - nslots)))

    # Per-tile slot-window base (128-slot tiles): the covering slot of
    # byte j*tw is (#real starts <= j*tw) - 1, counted on the
    # UNCOMPACTED array (ranks preserve order).
    if ntiles > 1:
        cs = jnp.where(real, st_c, ow + 1)          # [N, S]
        tbase = (jnp.arange(ntiles, dtype=jnp.int32) * tw)[None, :, None]
        cover = (cs[:, None, :] <= tbase).sum(axis=2).astype(jnp.int32) - 1
        wins = jnp.clip(jnp.maximum(cover, 0) // LANES, 0, s_tiles - win)
    else:
        wins = jnp.zeros((n, 1), jnp.int32)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)

    bundle_c = pl.pallas_call(
        functools.partial(_compact_kernel, s_pad=s_pad),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 32, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 32, s_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 32, s_pad), jnp.int8),
        interpret=interpret,
        **kwargs,
    )(bundle, rank8)

    def kern(total_ref, win_ref, plane_ref, *rest):
        _emit_kernel(total_ref, win_ref, plane_ref, rest, tw=tw,
                     nrows=nrows, win=win)

    def win_map(k):
        return lambda i, j, total_ref, win_ref: (i, 0, win_ref[i, j] + k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, ntiles),
        in_specs=[
            pl.BlockSpec((1, nrows, LANES), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, 32, LANES), win_map(k),
                        memory_space=pltpu.VMEM) for k in range(win)],
        out_specs=pl.BlockSpec((1, tw, LANES), lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ow, LANES), jnp.uint8),
        interpret=interpret,
        **kwargs,
    )(layout["total"].astype(jnp.int32), wins,
      planes.reshape(n, nrows, LANES), *([bundle_c] * win))
    return out[:, :, 0]


# ---------------------------------------------------------------------------
# Packed-lane emission (v2): output bytes on (row, lane), no broadcast.
# ---------------------------------------------------------------------------

#: wire row map inside the packed kernel's fb operand: rows 0-2 carry
#: the start key s1 = start+1 byte-decomposed (17 bits), 3-4 lit_len,
#: 5-6 lit_start>>7, 7 lit_start&127, 8-9 mv+1, 10-11 offset.
_PK_ROWS = 12


def _pmax2d(v, *, R):
    """Row-major 2D prefix-max of a [R, 128] int32 plane (all >= 0).

    Lane prefix by masked log-shifts, then an exclusive row carry from
    rotate-max row totals — every intermediate stays full-width [R,
    128] (the v5e Mosaic narrowing hits single-lane slice chains)."""
    lane = lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    rowi = lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    p = v
    s = 1
    while s < LANES:
        sh = jnp.where(lane >= s, pltpu.roll(p, s, axis=1), 0)
        p = jnp.maximum(p, sh)
        s *= 2
    m = p                                    # rotate-max -> row max on all lanes
    s = 1
    while s < LANES:
        m = jnp.maximum(m, pltpu.roll(m, s, axis=1))
        s *= 2
    c = jnp.where(rowi >= 1, pltpu.roll(m, 1, axis=0), 0)   # exclusive
    s = 1
    while s < R:
        sh = jnp.where(rowi >= s, pltpu.roll(c, s, axis=0), 0)
        c = jnp.maximum(c, sh)
        s *= 2
    return jnp.maximum(p, c)


def _packed_kernel(total_ref, blen_ref, plane_ref, fb_ref, stv_ref,
                   out_ref, *, R, s_pad, nrows, fmt):
    """One grid step emits one whole block, output bytes PACKED:
    out[r, l] is wire byte t = r*128 + l (no lane broadcast — 128x less
    VMEM/HBM than the windowed kernel, and no per-tile windows at all).

    Slot fields reach every byte in two moves: (1) two one-hot factors
    scatter each real slot's field bytes at its start cell — A[r, k] =
    (r == start_k >> 7) row-anchors x C[l, k] = (l == start_k & 127)
    lane-anchors ride ONE int8 matmul per byte row; (2) wires packed
    (s1 << 8 | byte) propagate by 2D prefix-max ("latest start wins",
    the XLA materialize's cummax in packed form).  Literal bytes
    resolve with a data-adaptive loop: each round serves, per row, the
    smallest outstanding source plane row (and its successor) via a
    row one-hot matmul — rows inside one literal run finish in one
    round; a row crossing k runs takes <= k rounds.
    """
    b = pl.program_id(0)
    st = stv_ref[0, 0:1, :]                       # [1, s_pad] (sentinel big)
    row_i = lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    A = (row_i == (st >> 7)).astype(jnp.int8)     # [R, s_pad]
    lane_i = lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
    # int8 elementwise multiply doesn't legalize and a reused [128,
    # s_pad] i1 mask trips a Mosaic relayout; an int32 0/1 mask with
    # int32 multiply lowers cleanly.
    cl32 = (lane_i == (st & 127)).astype(jnp.int32)   # [128, s_pad]
    fbp = fb_ref[0]                               # [16, s_pad] int8

    def scat(j):
        C = (cl32 * (fbp[j:j + 1, :].astype(jnp.int32) & 0xFF)
             ).astype(jnp.int8)
        return jax.lax.dot_general(
            A, C, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)     # [R, 128] anchor bytes

    sb = [scat(j) & 0xFF for j in range(_PK_ROWS)]
    key = sb[0] + (sb[1] << 8) + (sb[2] << 16)    # s1 at anchors, else 0

    def wire(j):
        return _pmax2d((key << 8) | sb[j], R=R)

    w_start = (_pmax2d(key << 8, R=R) >> 8) - 1
    ll = (wire(3) & 0xFF) + ((wire(4) & 0xFF) << 8)
    ls_row = (wire(5) & 0xFF) + ((wire(6) & 0xFF) << 8)
    ls_lane = wire(7) & 0xFF
    mv = ((wire(8) & 0xFF) + ((wire(9) & 0xFF) << 8)) - 1
    off = (wire(10) & 0xFF) + ((wire(11) & 0xFF) << 8)

    lane = lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    rowi = lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    t = rowi * LANES + lane
    d = t - w_start
    if fmt == "lz4":
        n_lit_ext = jnp.where(ll >= 15, (ll - 15) // 255 + 1, 0)
        hdr = 1 + n_lit_ext
        lit_end = hdr + ll

        token = (jnp.minimum(ll, 15) << 4) | jnp.where(
            mv >= 0, jnp.minimum(mv, 15), 0)
        lit_ext = jnp.clip(ll - 15 - 255 * (d - 1), 0, 255)
        m_ext = jnp.clip(mv - 15 - 255 * (d - lit_end - 2), 0, 255)
        off_byte = jnp.where(d == lit_end, off & 0xFF, (off >> 8) & 0xFF)
    else:
        # snappy: [literal tag + 0-3 LE length bytes][literals]
        # [3-byte copy-2 element per <= 64-byte match chunk], preceded
        # once per block by the uncompressed-length varint.
        n1 = ll - 1
        extra = jnp.where(n1 < 60, 0,
                          jnp.where(n1 < 256, 1,
                                    jnp.where(n1 < 65536, 2, 3)))
        hdr = jnp.where(ll > 0, 1 + extra, 0)
        lit_end = hdr + ll
        tag_lit = jnp.where(extra == 0, n1 << 2, (59 + extra) << 2)
        sh8 = jnp.clip(8 * (d - 1), 0, 24)
        lit_ext = jnp.where(d == 0, tag_lit, (n1 >> sh8) & 0xFF)
        cd = d - lit_end
        ci = jnp.maximum(cd, 0) // 3
        r3 = cd - 3 * ci
        mlen = mv + 4                             # mv1 - 1 + 4
        clen = jnp.clip(mlen - 64 * ci, 1, 64)
        copy_byte = jnp.where(
            r3 == 0, 2 | ((clen - 1) << 2),
            jnp.where(r3 == 1, off & 0xFF, (off >> 8) & 0xFF))

    # Literal bytes: source row/lane with the < 2^16 carry discipline.
    lane_sum = ls_lane + (d - hdr)
    lit_row = jnp.clip(ls_row + (lane_sum >> 7), 0, nrows - 1)
    lane_idx = lane_sum & (LANES - 1)
    is_lit = (d >= hdr) & (d < lit_end) & (t < total_ref[b])

    plane_a = (plane_ref[0].astype(jnp.int32) - 128).astype(jnp.int8)
    # row k <- k+1 (Mosaic rejects a whole-plane int8 sublane rotate;
    # a static slice + concat lowers fine)
    plane_b = jnp.concatenate([plane_a[1:], plane_a[:1]], axis=0)
    r_lane = lax.broadcasted_iota(jnp.int32, (1, nrows), 1)

    # The loop carry must avoid i1 vectors (Mosaic can't legalize an
    # scf.yield of vector<i1>): ``done`` rides as int32 0/1.
    def lit_cond(state):
        done, _, it = state
        return jnp.logical_and(jnp.any(done == 0), it < LANES)

    def lit_body(state):
        done, acc, it = state
        c = jnp.min(jnp.where(done != 0, nrows, lit_row), axis=1,
                    keepdims=True)                       # [R, 1] < 2^16
        oh = (r_lane == c).astype(jnp.int8)              # [R, nrows]
        ra = jax.lax.dot_general(
            oh, plane_a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        rb = jax.lax.dot_general(
            oh, plane_b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        # Gather BEFORE selecting: the row choice keys on the
        # destination element's lit_row, but a where() applied to the
        # pre-gather planes would be evaluated at the SOURCE lane.
        pick_a = jnp.take_along_axis(ra, lane_idx, axis=1)
        pick_b = jnp.take_along_axis(rb, lane_idx, axis=1)
        pick = jnp.where(lit_row == c, pick_a, pick_b) + 128
        hit = jnp.logical_and(
            done == 0,
            jnp.logical_or(lit_row == c, lit_row == c + 1))
        return (done | hit.astype(jnp.int32),
                jnp.where(hit, pick, acc), it + 1)

    done0 = jnp.logical_not(is_lit).astype(jnp.int32)
    _, lit_byte, _ = lax.while_loop(
        lit_cond, lit_body,
        (done0, jnp.zeros((R, LANES), jnp.int32), jnp.int32(0)))

    if fmt == "lz4":
        val = jnp.where(
            d == 0, token,
            jnp.where(d < hdr, lit_ext,
                      jnp.where(d < lit_end, lit_byte,
                                jnp.where(d < lit_end + 2, off_byte,
                                          m_ext))))
    else:
        blen = blen_ref[b]
        pre = (blen >> jnp.clip(7 * t, 0, 28)) & 0x7F
        more = (blen >> jnp.clip(7 * (t + 1), 0, 28)) > 0
        pre = jnp.where(more, pre | 0x80, pre)
        val = jnp.where(d < hdr, lit_ext,
                        jnp.where(d < lit_end, lit_byte, copy_byte))
        vl = 1 + jnp.where(blen >= (1 << 7), 1, 0) \
            + jnp.where(blen >= (1 << 14), 1, 0)
        val = jnp.where(t < vl, pre, val)
    val = jnp.where(t < total_ref[b], val, 0)
    out_ref[0] = val.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_width", "interpret",
                                             "fmt"))
def materialize_pallas_packed(planes, layout, *, out_width: int,
                              interpret: bool = False, fmt: str = "lz4",
                              lengths=None):
    """Packed-lane Pallas emission: same contract as
    :func:`materialize_pallas` (zeros past ``total``; rows whose total
    exceeds out_width are garbage under the caller's RAW fallback), but
    the output carries one byte per (sublane, lane) cell instead of a
    128-lane broadcast — requires ``out_width % 128 == 0`` and
    ``out_width < 2^16`` (the wires' 17-bit start key + byte packing).
    """
    n, L = planes.shape
    ow = out_width
    nrows = L // LANES
    R = ow // LANES
    starts = layout["starts"]                       # [N, S]
    nslots = starts.shape[1]
    s_pad = -(-nslots // LANES) * LANES
    SENT = jnp.int32(1 << 20)

    sizes = jnp.diff(starts, axis=1)
    sizes = jnp.concatenate(
        [sizes, jnp.maximum(layout["total"][:, None] - starts[:, -1:], 0)],
        axis=1)
    real = sizes > 0
    st_c = jnp.clip(starts, 0, ow - 1)
    ll_c = jnp.minimum(layout["lit_len"], 0xFFFF)
    ls_c = jnp.clip(layout["lit_start"], 0, (1 << 17) - 1)
    mv1 = jnp.clip(jnp.where(layout["mv"] >= 0, layout["mv"] + 1, 0),
                   0, 0x7FFF)
    off_c = jnp.clip(layout["off"], 0, 0xFFFF)
    s1 = jnp.where(real, st_c + 1, 0)

    def bts(v, c):
        return [((v >> (8 * j)) & 0xFF).astype(jnp.int8) for j in range(c)]

    rows = (bts(s1, 3) + bts(ll_c, 2) + bts(ls_c >> 7, 2)
            + bts(ls_c & 127, 1) + bts(mv1, 2) + bts(off_c, 2))
    fb = jnp.stack(rows, axis=1)                    # [N, 12, S] lane-major
    fb = jnp.pad(fb, ((0, 0), (0, 16 - _PK_ROWS), (0, s_pad - nslots)))
    stv = jnp.where(real, st_c, SENT)[:, None, :]
    stv = jnp.pad(stv, ((0, 0), (0, 7), (0, s_pad - nslots)),
                  constant_values=1 << 20)

    if lengths is None:
        lengths = jnp.full((n,), L, jnp.int32)
    kern = functools.partial(_packed_kernel, R=R, s_pad=s_pad, nrows=nrows,
                             fmt=fmt)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, nrows, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, s_pad), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, s_pad), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, LANES), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, R, LANES), jnp.uint8),
        interpret=interpret,
        **kwargs,
    )(layout["total"].astype(jnp.int32), jnp.asarray(lengths, jnp.int32),
      planes.reshape(n, nrows, LANES), fb, stv)
    return out.reshape(n, ow)
