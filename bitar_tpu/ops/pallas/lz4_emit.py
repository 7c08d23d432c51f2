"""Pallas LZ4 byte-emission kernel (the materialize stage on-chip).

Emits the standard LZ4 byte stream for a batch of blocks from the
sequence layout (``device_compress.parse_and_size`` /
``_layout_from_records``).  The XLA materialize pays operand-
proportional costs for its three wire scatters, cummax propagation and
the literal gather (measured ~12 ms per 256 x 128 KiB at OW=2048);
this kernel rebuilds the same bytes with:

1. **Slot one-hot by interval test** — no rank scan: output byte t
   belongs to slot k iff ``starts[k] <= t < starts[k] + sizes[k]``
   (empty slots have size 0), so the [OW, S] one-hot is two broadcast
   compares.  Slots live on LANES (S padded to 128 multiples), output
   bytes on ROWS.
2. **MXU field gather** — per-byte slot fields come from ONE int8
   matmul: ``onehot [OW, S] @ field_bytes [S, 16]`` with the five slot
   fields byte-decomposed host-side (values < 2^18: 13 int8 columns).
3. **MXU literal gather** — the literal byte's plane row is selected
   with a second one-hot matmul over the raw plane's 1024 rows; the
   lane lands with one in-tile dynamic-lane gather.

Everything keeps output bytes on SUBLANES ([OW, ...] planes, value
broadcast across lanes; the caller slices lane 0), so no transposes or
cross-tile reshapes appear anywhere.

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


def _emit_kernel(total_ref, plane_ref, fb_ref, iv_ref, out_ref, *, ow,
                 s_pad, nrows, blk):
    """One grid step emits one block's LZ4 bytes.

    total_ref (N,) SMEM     exact compressed size per block
    plane_ref (1, nrows, 128) VMEM uint8 raw plane (natural layout)
    fb_ref   (1, s_pad, 128) VMEM int8: byte-decomposed slot fields,
             slot-major rows (cols 0-1 starts, 2-3 ll, 4-5 ls>>7,
             6 ls&127, 7-8 mv1, 9-10 off; rest zero) — the MXU gather
             operand
    iv_ref   (1, 8, s_pad) VMEM int32: interval bounds with slots on
             LANES (row 0 starts, row 1 ends) — extracting a lane
             vector from fb's slot-major rows would be a transpose
    out_ref  (1, ow, 128) VMEM uint8: byte value broadcast across lanes
    """
    b = pl.program_id(0)
    t_col = lax.broadcasted_iota(jnp.int32, (ow, 1), 0)

    starts = iv_ref[0, 0:1, :]                    # [1, s_pad]
    ends = iv_ref[0, 1:2, :]
    # One-hot by interval test: empty slots have ends == starts.
    oh = jnp.logical_and(starts <= t_col, t_col < ends).astype(jnp.int8)
    # Field gather: one int8 matmul against the byte-decomposed fields.
    gf = jax.lax.dot_general(
        oh, fb_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # [ow, 128]

    def gcol(c0, nbytes):
        # One-hot rows gather a single signed byte; mask to unsigned.
        # HW CONSTRAINT: every recombined field must stay < 2^16.
        # Mosaic narrows single-lane i32 slice chains to 16 bits on
        # v5e (observed: ``gf[:, 6:7] << 16`` evaluates to 0 while the
        # full-width shift is exact; interpret mode exact), so no
        # field may use a third byte — which is why lit_start is
        # carried as a (row, lane) pair below, never as a 17-bit
        # value.
        v = gf[:, c0:c0 + 1] & 0xFF
        for j in range(1, nbytes):
            v = v + ((gf[:, c0 + j:c0 + j + 1] & 0xFF) << (8 * j))
        return v                                   # [ow, 1]

    w_start = gcol(0, 2)
    ll = gcol(2, 2)
    ls_row = gcol(4, 2)                            # lit_start >> 7
    ls_lane = gcol(6, 1)                           # lit_start & 127
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
    lane_sum = ls_lane + (d - hdr)                 # [-ow, 127 + ow]
    lit_row = jnp.clip(ls_row + (lane_sum >> 7), 0, nrows - 1)
    r_lane = lax.broadcasted_iota(jnp.int32, (1, nrows), 1)
    oh2 = (r_lane == lit_row).astype(jnp.int8)            # [ow, nrows]
    plane_b = (plane_ref[0].astype(jnp.int32) - 128).astype(jnp.int8)
    rowsel = jax.lax.dot_general(
        oh2, plane_b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                 # [ow, 128]
    lane_idx = jnp.broadcast_to(lane_sum & 127, (ow, LANES))
    lit_byte = jnp.take_along_axis(rowsel, lane_idx, axis=1)[:, :1] + 128

    val = jnp.where(
        d == 0, token,
        jnp.where(d < hdr, lit_ext,
                  jnp.where(d < lit_end, lit_byte,
                            jnp.where(d < lit_end + 2, off_byte, m_ext))))
    val = jnp.where(t_col < total_ref[b], val, 0)
    out_ref[0] = jnp.broadcast_to(val, (ow, LANES)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_width", "interpret"))
def materialize_pallas(planes, layout, *, out_width: int,
                       interpret: bool = False):
    """Pallas emission of the LZ4 stream described by ``layout``.

    Same contract as ``device_compress.materialize``: planes [N, L]
    uint8, returns [N, out_width] uint8 (zeros past ``total``; rows
    whose total exceeds out_width are garbage — the caller's RAW
    fallback drops them).  Requires lit_len/lit_start/mv/off field
    ranges of a real emission (ll < 2^16, ls < 2^17 = 128 KiB blocks,
    mv < 2^15, off < 2^16)."""
    n, L = planes.shape
    ow = out_width
    nrows = L // LANES
    starts = layout["starts"]                       # [N, S]
    nslots = starts.shape[1]
    s_pad = -(-nslots // LANES) * LANES

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
    # lit_start ships as (row, lane) = (ls >> 7, ls & 127) so the
    # kernel never recombines a >= 2^16 value from gathered bytes (the
    # Mosaic 16-bit narrowing noted in _emit_kernel.gcol).
    mv1 = jnp.clip(jnp.where(layout["mv"] >= 0, layout["mv"] + 1, 0),
                   0, 0x7FFF)
    off_c = jnp.clip(layout["off"], 0, 0xFFFF)

    def bts(v, c):
        return [((v >> (8 * j)) & 0xFF).astype(jnp.int8) for j in range(c)]

    cols = (bts(st_c, 2) + bts(ll_c, 2) + bts(ls_c >> 7, 2)
            + bts(ls_c & 127, 1) + bts(mv1, 2) + bts(off_c, 2))
    fb = jnp.stack(cols, axis=2)                    # [N, S, 11]
    fb = jnp.pad(fb, ((0, 0), (0, s_pad - nslots), (0, 117)))
    iv = jnp.stack([st_c, ends_c], axis=1)          # [N, 2, S]
    iv = jnp.pad(iv, ((0, 0), (0, 6), (0, s_pad - nslots)),
                 constant_values=ow)                # pad slots: empty

    kernel = functools.partial(_emit_kernel, ow=ow, s_pad=s_pad,
                               nrows=nrows, blk=L)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, nrows, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, s_pad), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ow, LANES), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ow, LANES), jnp.uint8),
        interpret=interpret,
        **kwargs,
    )(layout["total"].astype(jnp.int32),
      planes.reshape(n, nrows, LANES), fb, iv)
    return out[:, :, 0]
