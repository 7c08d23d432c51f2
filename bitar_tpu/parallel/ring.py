"""Ring-pipelined shuffle+decode: per-peer ppermute rounds with decode
overlapping exchange.

``distributed_step_flat`` (pipeline.py) issues ONE ``all_to_all`` and
then decodes everything it received — XLA may overlap the tail of the
exchange with the head of the decode, but the program gives it a single
monolithic collective to work with.  This variant lifts the reference's
defining hot-loop trick — enqueue the next burst while the device works
on the previous one (``device.cc:197-226``) — to pod level explicitly:

* round 0 decodes the locally-kept chunk (no communication),
* round r (1..D-1) ppermutes each device's chunk for peer (i+r) mod D
  while the chunk received in round r-1 decodes,

so every decode grid is independent of the collective in flight and
XLA's latency-hiding scheduler can overlap them on real ICI (async
collective permute).  On the virtual CPU mesh the schedule serializes —
tests assert bit-exactness against the fused all_to_all step; the
overlap itself is a hardware property to be profiled on a pod slice.

Wire layout matches ``distributed_step_flat`` exactly (same staging
metadata, per-(dst, src)-chunk flat wires from
``prepare_ring_flat_wires_for_recv``, same output order), so the two are
drop-in interchangeable.  Both run the ONE production decode kernel
(``decode_blocks_flat``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .sharding import BLOCKS_AXIS


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "rows_per_pair", "comp_rows", "block_size",
                     "gather_rows", "interpret"))
def distributed_step_ring_flat(slot_rows, send_idx, valid, p_used, p_off, p0,
                               dense, dq_idx, se, shift, dq, row_a, *,
                               mesh: Mesh, rows_per_pair: int, comp_rows: int,
                               block_size: int, gather_rows: int | None = None,
                               interpret: bool = False):
    """Ring-pipelined shuffle + FLAT-PLAN decode: the production decode
    path (dense per-byte wire, identity RAW, scheduled passes) under the
    per-peer ppermute schedule, so the exchange of chunk r overlaps the
    decode of chunk r-1 on real ICI.  Drop-in interchangeable with
    ``distributed_step_flat``: same slot rows and staging metadata, same
    output order; the wires come from ``prepare_ring_flat_wires_for_recv``
    (per-(dst, src) chunks with shared static padding, so all D rounds
    reuse ONE compiled kernel).
    """
    from ..ops.pallas.lz4_decode_flat import bias_planes, decode_blocks_flat

    d = mesh.devices.size
    rpp = rows_per_pair
    slot = slot_rows.shape[1]
    nrows = block_size // 128

    def decode_chunk(rows_chunk, pu, po, p0c, dn, di, se_c, sh_c, dq_c, ra_c):
        planes = bias_planes(rows_chunk, comp_rows)
        out = decode_blocks_flat(
            planes, pu, po, p0c, se_c, sh_c, None, dq_c, ra_c, dn, di,
            comp_rows=comp_rows, out_rows=nrows, gather_rows=gather_rows,
            interpret=interpret)
        return out.reshape(rpp, block_size)

    def local(rows_l, send_idx_l, valid_l, pu_l, po_l, p0_l, dn_l, di_l,
              se_l, sh_l, dq_l, ra_l):
        me = lax.axis_index(BLOCKS_AXIS)
        staged = rows_l[send_idx_l[0, 0]] * valid_l[0, 0][:, None].astype(
            rows_l.dtype)
        staged = staged.reshape(d, rpp, slot)

        def take(arr, idx):
            return lax.dynamic_index_in_dim(arr, idx, axis=0, keepdims=False)

        def chunk_wires(src):
            # local wire arrays are [1(dst shard), D(src), ...]
            return tuple(take(a[0], src) for a in
                         (pu_l, po_l, p0_l, dn_l, di_l,
                          se_l, sh_l, dq_l, ra_l))

        # Round 0: the chunk we keep; rounds 1..d-1: ppermute for peer
        # (me+r) while the previous round's chunk decodes (the reference
        # enqueue-while-working loop, device.cc:197-226, at pod level).
        decoded = {0: decode_chunk(take(staged, me), *chunk_wires(me))}
        recvs = []
        for r in range(1, d):
            perm = [(i, (i + r) % d) for i in range(d)]
            recvs.append((r, lax.ppermute(
                take(staged, (me + r) % d), BLOCKS_AXIS, perm)))
        for r, recv in recvs:
            src = (me - r) % d
            decoded[r] = decode_chunk(recv, *chunk_wires(src))

        out = jnp.zeros((d, rpp, block_size), jnp.uint8)
        out = lax.dynamic_update_index_in_dim(out, decoded[0], me, axis=0)
        for r, _ in recvs:
            src = (me - r) % d
            out = lax.dynamic_update_index_in_dim(out, decoded[r], src,
                                                  axis=0)
        return out.reshape(d * rpp, block_size)

    spec = P(BLOCKS_AXIS)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec,) * 12, out_specs=spec,
        check_vma=False,
    )(slot_rows, send_idx, valid, p_used, p_off, p0, dense, dq_idx,
      se, shift, dq, row_a)
