"""Fused shuffle + FLAT-plan decode over the 8-way virtual mesh.

The production decode path (``decode_blocks_flat``) is the ONE decode
semantics at pod level (round-3 consolidation): the fused all_to_all step
and the ring-pipelined step both execute it; ``lz4_decode_planned`` is a
test-only oracle now (see test_planned_decode.py).
"""

import numpy as np

import jax.numpy as jnp

from bitar_tpu.ops.cpu import native
from bitar_tpu.parallel import (
    make_mesh,
    plan_shuffle,
)

BLOCK = 16 * 1024
NROWS = BLOCK // 128


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
