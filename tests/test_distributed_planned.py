"""Fused shuffle + plan-execute decode over the 8-way virtual mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.pallas.lz4_decode_planned import pack_plan
from bitar_tpu.parallel import (
    BLOCKS_AXIS,
    distributed_step_planned,
    distributed_step_ring,
    make_mesh,
    plan_shuffle,
    reorder_plans_for_recv,
)

BLOCK = 16 * 1024
NROWS = BLOCK // 128


def test_fused_planned_step_bit_exact(rng):
    d = 8
    nblocks = 16
    mesh = make_mesh(d)

    datas = []
    for i in range(nblocks):
        k = i % 3
        if k == 0:
            datas.append(((b"dist planned %d " % i) * (BLOCK // 14 + 1))[:BLOCK])
        elif k == 1:
            datas.append(rng.integers(0, 8, BLOCK, dtype=np.uint8).tobytes())
        else:
            datas.append(bytes([i]) * BLOCK)
    comps = [np.asarray(native.lz4_compress(x)) for x in datas]

    # decode plans per block
    plans = [native.plan_block(c, BLOCK, NROWS, max_passes=96, codec="lz4")
             for c in comps]
    assert all(p[0] is not None for p in plans)
    passes = max(4, -(-max(p[0] for p in plans) // 4) * 4)
    comp_rows = -(-max(len(c) for c in comps) // 128)
    comp_rows = -(-comp_rows // 32) * 32
    se = np.zeros((nblocks, passes, NROWS), np.int32)
    shift = np.zeros_like(se)
    p_used = np.zeros(nblocks, np.int32)
    for i, (Pn, p0, cols) in enumerate(plans):
        se_i, sh_i = pack_plan(cols["r_dstart"][:Pn], cols["r_dend"][:Pn],
                               cols["r_shift"][:Pn], p0, passes, comp_rows)
        se[i], shift[i], p_used[i] = se_i, sh_i, Pn

    # shuffle plan + slot rows
    slot = comp_rows * 128
    sizes = np.array([len(c) for c in comps], np.int64)
    splan = plan_shuffle(nblocks, d, sizes=sizes)
    rows = np.zeros((nblocks, slot), np.uint8)
    for i, c in enumerate(comps):
        rows[i, :len(c)] = c

    rse, rshift, rp = reorder_plans_for_recv(splan, se, shift, p_used)
    sharding = NamedSharding(mesh, P(BLOCKS_AXIS))
    dev = lambda a: jax.device_put(jnp.asarray(a))  # noqa: E731
    per_src = nblocks // d
    out = distributed_step_planned(
        dev(rows),
        dev((splan.send_order % max(1, per_src)).reshape(d, 1, -1).astype(np.int32)),
        dev((splan.send_order >= 0).reshape(d, 1, -1)),
        dev(rp),
        dev(rse.reshape(-1, passes, NROWS // 128, 128)),
        dev(rshift.reshape(-1, passes, NROWS // 128, 128)),
        mesh=mesh, rows_per_pair=splan.rows_per_pair, passes=passes,
        comp_rows=comp_rows, block_size=BLOCK, interpret=True)
    out = np.asarray(out)

    flat = splan.recv_block.reshape(-1)
    checked = 0
    for pos, b in enumerate(flat):
        if b >= 0:
            assert out[pos].tobytes() == datas[b], f"block {b} at pos {pos}"
            checked += 1
    assert checked == nblocks
    _ = sharding


def test_ring_step_matches_fused_all_to_all(rng):
    # The ppermute-ring variant (exchange overlapped with decode) must be
    # bit-identical to the single-all_to_all fused step.
    d = 8
    nblocks = 16
    mesh = make_mesh(d)
    datas = []
    for i in range(nblocks):
        k = i % 3
        if k == 0:
            datas.append(((b"ring %d " % i) * (BLOCK // 6 + 1))[:BLOCK])
        elif k == 1:
            datas.append(rng.integers(0, 8, BLOCK, dtype=np.uint8).tobytes())
        else:
            datas.append(bytes([i]) * BLOCK)
    comps = [np.asarray(native.lz4_compress(x)) for x in datas]
    plans = [native.plan_block(c, BLOCK, NROWS, max_passes=96, codec="lz4")
             for c in comps]
    assert all(p[0] is not None for p in plans)
    passes = max(4, -(-max(p[0] for p in plans) // 4) * 4)
    comp_rows = -(-max(len(c) for c in comps) // 128)
    comp_rows = -(-comp_rows // 32) * 32
    se = np.zeros((nblocks, passes, NROWS), np.int32)
    shift = np.zeros_like(se)
    p_used = np.zeros(nblocks, np.int32)
    for i, (Pn, p0, cols) in enumerate(plans):
        se_i, sh_i = pack_plan(cols["r_dstart"][:Pn], cols["r_dend"][:Pn],
                               cols["r_shift"][:Pn], p0, passes, comp_rows)
        se[i], shift[i], p_used[i] = se_i, sh_i, Pn
    slot = comp_rows * 128
    sizes = np.array([len(c) for c in comps], np.int64)
    splan = plan_shuffle(nblocks, d, sizes=sizes)
    rows = np.zeros((nblocks, slot), np.uint8)
    for i, c in enumerate(comps):
        rows[i, :len(c)] = c
    rse, rshift, rp = reorder_plans_for_recv(splan, se, shift, p_used)
    per_src = nblocks // d
    args = (
        jnp.asarray(rows),
        jnp.asarray((splan.send_order % max(1, per_src)).reshape(d, 1, -1).astype(np.int32)),
        jnp.asarray((splan.send_order >= 0).reshape(d, 1, -1)),
        jnp.asarray(rp),
        jnp.asarray(rse.reshape(-1, passes, NROWS // 128, 128)),
        jnp.asarray(rshift.reshape(-1, passes, NROWS // 128, 128)),
    )
    kwargs = dict(mesh=mesh, rows_per_pair=splan.rows_per_pair, passes=passes,
                  comp_rows=comp_rows, block_size=BLOCK, interpret=True)
    fused = np.asarray(distributed_step_planned(*args, **kwargs))
    ring = np.asarray(distributed_step_ring(*args, **kwargs))
    assert (fused == ring).all()
    # and both are the right bytes
    flat = splan.recv_block.reshape(-1)
    for pos, b in enumerate(flat):
        if b >= 0:
            assert ring[pos].tobytes() == datas[b], f"block {b} at {pos}"


def test_ring_flat_step_matches_fused(rng):
    # The ring-pipelined variant of the PRODUCTION (flat) decode step
    # must be bit-identical to the single-all_to_all fused flat step —
    # round 2 shipped the ring only on the legacy planned kernel.
    from bitar_tpu.parallel import (
        distributed_step_flat,
        distributed_step_ring_flat,
        prepare_flat_wires_for_recv,
        prepare_ring_flat_wires_for_recv,
    )

    d = 8
    nblocks = 16
    mesh = make_mesh(d)
    datas = []
    for i in range(nblocks):
        k = i % 4
        if k == 0:
            datas.append(((b"ring flat %d " % i) * (BLOCK // 11 + 1))[:BLOCK])
        elif k == 1:
            datas.append(rng.integers(0, 8, BLOCK, dtype=np.uint8).tobytes())
        elif k == 2:
            datas.append(bytes([i]) * BLOCK)
        else:
            datas.append(rng.integers(0, 256, BLOCK, np.uint8).tobytes())
    comps, cids = [], []
    for x in datas:
        c = np.asarray(native.lz4_compress(x, min_match=6))
        if len(c) >= BLOCK:
            c = np.frombuffer(x, np.uint8)
            cids.append(3)
        else:
            cids.append(0)
        comps.append(c)
    src = np.concatenate(comps)
    lens = np.array([len(c) for c in comps], np.int32)
    off = np.zeros(nblocks, np.int64)
    off[1:] = np.cumsum(lens[:-1].astype(np.int64))
    se, sh, pu, p0, st, _, dq, ra, dn = native.plan_batch_flat(
        src, off, lens, np.full(nblocks, BLOCK, np.int32),
        np.asarray(cids, np.int32), NROWS, 160, cb=4)
    assert (st == 0).all(), st

    splan = plan_shuffle(nblocks, d, sizes=lens.astype(np.int64))
    comp_rows = NROWS
    slot = comp_rows * 128
    rows = np.zeros((nblocks, slot), np.uint8)
    for i, c in enumerate(comps):
        rows[i, :len(c)] = c
    per_src = nblocks // d
    dev = jnp.asarray
    common = (
        dev(rows),
        dev((splan.send_order % max(1, per_src)).reshape(
            d, 1, -1).astype(np.int32)),
        dev((splan.send_order >= 0).reshape(d, 1, -1)),
    )
    kwargs = dict(mesh=mesh, rows_per_pair=splan.rows_per_pair,
                  comp_rows=comp_rows, block_size=BLOCK, interpret=True)
    wf = prepare_flat_wires_for_recv(splan, se, sh, pu, p0, dq, ra, dn, NROWS)
    fused = np.asarray(distributed_step_flat(
        *common, dev(wf["p_used"]), dev(wf["p_off"]), dev(wf["p0"]),
        dev(wf["dense"]), dev(wf["dq_idx"]), dev(wf["se"]), dev(wf["shift"]),
        dev(wf["dq"]), dev(wf["row_a"]), **kwargs))
    wr = prepare_ring_flat_wires_for_recv(
        splan, se, sh, pu, p0, dq, ra, dn, NROWS)
    ring = np.asarray(distributed_step_ring_flat(
        *common, dev(wr["p_used"]), dev(wr["p_off"]), dev(wr["p0"]),
        dev(wr["dense"]), dev(wr["dq_idx"]), dev(wr["se"]), dev(wr["shift"]),
        dev(wr["dq"]), dev(wr["row_a"]), **kwargs))
    # Live wire rows must agree bit-exactly (idle rows are unspecified
    # filler in both variants).
    flat = splan.recv_block.reshape(-1)
    checked = 0
    for pos, b in enumerate(flat):
        if b >= 0:
            assert (fused[pos] == ring[pos]).all(), f"pos {pos}"
            assert ring[pos].tobytes() == datas[b], f"block {b} at {pos}"
            checked += 1
    assert checked == nblocks


def test_fused_flat_step_bit_exact(rng):
    # The engine's fast path (dense per-byte wire + identity RAW +
    # scheduled passes) lifted to the mesh: shuffle + decode_blocks_flat
    # per destination shard, bit-exact against the raw corpus.
    from bitar_tpu.parallel import (
        distributed_step_flat,
        prepare_flat_wires_for_recv,
    )

    d = 8
    nblocks = 16
    mesh = make_mesh(d)

    datas = []
    for i in range(nblocks):
        k = i % 4
        if k == 0:
            datas.append(((b"dist flat %d " % i) * (BLOCK // 11 + 1))[:BLOCK])
        elif k == 1:
            datas.append(rng.integers(0, 8, BLOCK, dtype=np.uint8).tobytes())
        elif k == 2:
            datas.append(bytes([i]) * BLOCK)
        else:
            # RAW (identity-dense) wire positions: stored verbatim
            datas.append(rng.integers(0, 256, BLOCK, np.uint8).tobytes())
    comps, cids = [], []
    for x in datas:
        c = np.asarray(native.lz4_compress(x, min_match=6))
        if len(c) >= BLOCK:               # engine RAW fallback semantics
            c = np.frombuffer(x, np.uint8)
            cids.append(3)                # BT_CODEC_RAW
        else:
            cids.append(0)
        comps.append(c)

    src = np.concatenate(comps)
    lens = np.array([len(c) for c in comps], np.int32)
    off = np.zeros(nblocks, np.int64)
    off[1:] = np.cumsum(lens[:-1].astype(np.int64))
    se, sh, pu, p0, st, _, dq, ra, dn = native.plan_batch_flat(
        src, off, lens, np.full(nblocks, BLOCK, np.int32),
        np.asarray(cids, np.int32), NROWS, 160, cb=4)
    assert (st == 0).all(), st

    sizes = lens.astype(np.int64)
    splan = plan_shuffle(nblocks, d, sizes=sizes)
    comp_rows = NROWS                      # RAW blocks fill the plane
    slot = comp_rows * 128
    rows = np.zeros((nblocks, slot), np.uint8)
    for i, c in enumerate(comps):
        rows[i, :len(c)] = c
    wires = prepare_flat_wires_for_recv(
        splan, se, sh, pu, p0, dq, ra, dn, NROWS)
    per_src = nblocks // d
    dev = jnp.asarray
    out = np.asarray(distributed_step_flat(
        dev(rows),
        dev((splan.send_order % max(1, per_src)).reshape(
            d, 1, -1).astype(np.int32)),
        dev((splan.send_order >= 0).reshape(d, 1, -1)),
        dev(wires["p_used"]), dev(wires["p_off"]), dev(wires["p0"]),
        dev(wires["dense"]), dev(wires["dq_idx"]),
        dev(wires["se"]), dev(wires["shift"]),
        dev(wires["dq"]), dev(wires["row_a"]),
        mesh=mesh, rows_per_pair=splan.rows_per_pair,
        comp_rows=comp_rows, block_size=BLOCK, interpret=True))
    flat = splan.recv_block.reshape(-1)
    checked = 0
    for pos, b in enumerate(flat):
        if b >= 0:
            assert out[pos].tobytes() == datas[b], f"block {b} at {pos}"
            checked += 1
    assert checked == nblocks
