"""Plan-execute decoder tests: the C++ planner (fragment scheduling) against
a numpy executor, and the Pallas planned kernel end-to-end through the
engine (interpreter mode).
"""

import numpy as np
import pytest

import bitar_tpu as bt
from bitar_tpu.ops.cpu import native

BLOCK = 16 * 1024           # smallest planned-kernel block (128 rows)
NROWS = BLOCK // 128


def exec_plan_numpy(P, p0, cols, comp, n, nrows):
    """Numpy oracle with the kernel's exact semantics."""
    out = np.zeros(nrows * 128, dtype=np.int64)
    carr = np.asarray(comp, dtype=np.int64)
    p = np.arange(nrows * 128)
    for k in range(P):
        dstart = np.repeat(cols["r_dstart"][k], 128)
        dend = np.repeat(cols["r_dend"][k], 128)
        shift = np.repeat(cols["r_shift"][k], 128)
        active = (p >= dstart) & (p < dend)
        src = carr if k < p0 else out
        vals = src[np.clip(p + shift, 0, len(src) - 1)]
        out = np.where(active, vals, out)
    return out[:n].astype(np.uint8)


def cases(rng, n):
    return {
        "text": ((b"plan me please! " * (n // 14 + 2))[:n]),
        "random": bytes(rng.integers(0, 256, n, dtype=np.uint8)),
        "rle": b"\x37" * n,
        "pat8": (b"abcdefgh" * (n // 8 + 1))[:n],
        "struct": np.repeat(np.arange(n // 16 + 1, dtype=np.uint8), 16
                            ).tobytes()[:n],
    }


@pytest.mark.parametrize("codec", ["lz4", "snappy"])
def test_planner_numpy_oracle(codec, rng):
    for name, data in cases(rng, 5000).items():
        comp = (native.lz4_compress(data) if codec == "lz4"
                else native.snappy_compress(data))
        nr = max(1, -(-len(data) // 128))
        P, p0, cols = native.plan_block(comp, len(data), nr,
                                        max_passes=96, codec=codec)
        if P is None:
            continue  # unplannable blocks fall back; covered elsewhere
        got = exec_plan_numpy(P, p0, cols, comp, len(data), nr)
        assert got.tobytes() == data, f"{name}/{codec}"


def test_planner_fuzz(rng):
    fails = 0
    for trial in range(60):
        n = int(rng.integers(1, 4000))
        kind = trial % 4
        if kind == 0:
            d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        elif kind == 1:
            d = bytes(rng.integers(0, 4, n, dtype=np.uint8))
        elif kind == 2:
            d = bytes([trial & 0xFF]) * n
        else:
            d = ((b"w%d " % trial) * (n // 3 + 2))[:n]
        for codec in ("lz4", "snappy"):
            comp = (native.lz4_compress(d) if codec == "lz4"
                    else native.snappy_compress(d))
            nr = max(1, -(-len(d) // 128))
            P, p0, cols = native.plan_block(comp, len(d), nr,
                                            max_passes=96, codec=codec)
            if P is None:
                continue
            if exec_plan_numpy(P, p0, cols, comp, len(d), nr).tobytes() != d:
                fails += 1
    assert fails == 0


def test_planner_rejects_bad_out_len():
    comp = native.lz4_compress(b"hello world " * 100)
    with pytest.raises(bt.StatusError):
        native.plan_block(comp, 999999, 128, max_passes=96, codec="lz4")


def planned_engine(**kw):
    base = dict(codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=4,
                max_pool_slots=32, use_tpu_kernels=True, interpret=True)
    base.update(kw)
    return bt.Engine(bt.EngineConfig(**base)).initialize()


def test_engine_planned_path_roundtrip(rng):
    with planned_engine() as eng:
        data = (b"engine planned path " * 2000)[:2 * BLOCK + 777]
        unit = eng.compress(data)
        eng.ensure_plans(unit)
        assert unit.plan_flat is not None, "expected planned unit"
        out = eng.decompress(unit)
        assert out.tobytes() == data
        eng.recycle(unit)


def test_engine_planned_mixed_entropy(rng):
    with planned_engine() as eng:
        data = (rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes()
                + b"\x00" * BLOCK
                + (b"abcabcabc" * (BLOCK // 9 + 1))[:BLOCK])
        unit = eng.compress(data)
        out = eng.decompress(unit)
        assert out.tobytes() == data
        eng.recycle(unit)


def test_engine_small_blocks_fall_back_to_tables(rng):
    # block < 16 KiB -> no plan; sequence-table kernel path still works
    cfg = dict(block_size=1024, burst_size=4)
    with planned_engine(**cfg) as eng:
        data = (b"fallback " * 300)[:2500]
        unit = eng.compress(data)
        eng.ensure_plans(unit)
        assert unit.plan_flat is None and unit.tables is not None
        out = eng.decompress(unit)
        assert out.tobytes() == data
        eng.recycle(unit)


def test_flat_plan_variant(rng):
    # Pad-free HBM-resident plans with double-buffered per-chunk DMA (the
    # production kernel), against the numpy oracle and raw bytes.
    from bitar_tpu.ops.pallas.lz4_decode_flat import (
        build_flat_plans, decode_blocks_flat, decode_flat_numpy)
    import jax.numpy as jnp

    block, nrows = BLOCK, NROWS
    datas = [
        (b"flat wire " * (block // 9 + 1))[:block],
        rng.integers(0, 8, block, dtype=np.uint8).tobytes(),
        b"\x77" * block,
    ]
    comps = [np.asarray(native.lz4_compress(d)) for d in datas]
    raw_plans = [native.plan_block(c, block, nrows, max_passes=96, codec="lz4")
                 for c in comps]
    assert all(p[0] is not None for p in raw_plans)
    comp_rows = -(-max(len(c) for c in comps) // 128)
    comp_rows = -(-comp_rows // 128) * 128
    plans = build_flat_plans(raw_plans, comp_rows, nrows)
    n = len(datas)
    cp = np.zeros((n, comp_rows, 128), np.uint8)
    for i, c in enumerate(comps):
        cp[i].reshape(-1)[:len(c)] = c
    oracle = decode_flat_numpy(comps, plans, comp_rows, nrows)
    for i, d in enumerate(datas):
        assert oracle[i].reshape(-1)[:block].tobytes() == d, f"oracle {i}"
    cp_i8 = (cp.astype(np.int32) - 128).astype(np.int8)
    for depth in (2, 1):
        out = np.asarray(decode_blocks_flat(
            jnp.asarray(cp_i8), jnp.asarray(plans["p_used"]),
            jnp.asarray(plans["p_off"]), jnp.asarray(plans["p0"]),
            jnp.asarray(plans["se"]), jnp.asarray(plans["shift"]),
            comp_rows=comp_rows, out_rows=nrows, interpret=True,
            pipeline_depth=depth))
        for i, d in enumerate(datas):
            assert out[i].reshape(-1)[:block].tobytes() == d, f"block {i} depth {depth}"


def test_flat_plan_banded_gathers(rng):
    # Banded gathers (the large-block lever): per-(pass, M-tile) source
    # bands shrink the one-hot matmul K; must stay bit-exact vs full-K.
    from bitar_tpu.ops.pallas.lz4_decode_flat import (
        KBAND, bands_supported, build_flat_plans, compute_bands,
        decode_blocks_flat)
    import jax.numpy as jnp

    block, nrows = BLOCK, NROWS
    datas = [
        (b"banded gather " * (block // 13 + 1))[:block],
        rng.integers(0, 8, block, dtype=np.uint8).tobytes(),
        b"\x21" * block,
        rng.integers(0, 256, block, dtype=np.uint8).tobytes(),
    ]
    comps = [np.asarray(native.lz4_compress(d)) for d in datas]
    raw_plans = [native.plan_block(c, block, nrows, max_passes=96, codec="lz4")
                 for c in comps]
    assert all(p[0] is not None for p in raw_plans)
    comp_rows = -(-max(len(c) for c in comps) // 128)
    comp_rows = -(-comp_rows // 128) * 128
    if comp_rows > 128:
        comp_rows = -(-comp_rows // KBAND) * KBAND
    assert bands_supported(comp_rows, nrows)
    plans = build_flat_plans(raw_plans, comp_rows, nrows)
    bands = compute_bands(plans, comp_rows, nrows)
    # Window invariant: every band fits its plane ([base, base+cnt*KB)).
    nz = bands[bands != 0]
    assert nz.size, "expected populated bands"
    assert ((nz >> 8) % 8 == 0).all(), "band bases must be 8-aligned"
    n = len(datas)
    cp = np.zeros((n, comp_rows, 128), np.uint8)
    for i, c in enumerate(comps):
        cp[i].reshape(-1)[:len(c)] = c
    cp_i8 = (cp.astype(np.int32) - 128).astype(np.int8)
    out = np.asarray(decode_blocks_flat(
        jnp.asarray(cp_i8), jnp.asarray(plans["p_used"]),
        jnp.asarray(plans["p_off"]), jnp.asarray(plans["p0"]),
        jnp.asarray(plans["se"]), jnp.asarray(plans["shift"]),
        jnp.asarray(bands),
        comp_rows=comp_rows, out_rows=nrows, interpret=True))
    for i, d in enumerate(datas):
        assert out[i].reshape(-1)[:block].tobytes() == d, f"banded block {i}"


def test_flat_plan_static_bands(rng):
    # Static banded gathers: plans scheduled under bt_plan_batch's
    # band_rows constraint make every (pass, M-tile) band a single
    # KBAND-row window (cnt <= 1), so the kernel's static single-gather
    # mode applies; must stay bit-exact vs the oracle.
    from bitar_tpu.ops.pallas.lz4_decode_flat import (
        KBAND, attach_dense_planes, bands_supported, compute_bands,
        decode_blocks_flat, decode_flat_numpy, flatten_batch_plans)
    import jax.numpy as jnp

    block = 64 * 1024
    nrows = block // 128                       # 512: KB-tiled, >= 2*KBAND
    datas = [
        (b"static band gather " * (block // 19 + 1))[:block],
        rng.integers(0, 8, block, dtype=np.uint8).tobytes(),
        b"\x5a" * block,
        rng.integers(0, 256, block, dtype=np.uint8).tobytes(),
    ]
    comps = [np.asarray(native.lz4_compress(d)) for d in datas]
    src = np.concatenate(comps)
    lens = np.array([len(c) for c in comps], np.int32)
    off = np.zeros(len(comps), np.int64)
    off[1:] = np.cumsum(lens[:-1])
    se, sh, pu, p0, st, _, dq, ra, dn = native.plan_batch_flat(
        src, off, lens, np.full(len(comps), block, np.int32),
        np.zeros(len(comps), np.int32), nrows, 160, cb=4, band_rows=KBAND)
    assert (st == 0).all(), f"band-constrained planning failed: {st}"
    plans = attach_dense_planes(
        flatten_batch_plans(se, sh, pu, p0, nrows), dq, ra, dn)
    comp_rows = -(-int(lens.max()) // 128)
    comp_rows = -(-comp_rows // 128) * 128
    if comp_rows > 128:
        comp_rows = -(-comp_rows // KBAND) * KBAND
    assert bands_supported(comp_rows, nrows)
    bands = compute_bands(plans, comp_rows, nrows)
    assert int((bands & 0xFF).max()) <= 1, "planner band promise broken"
    oracle = decode_flat_numpy(comps, plans, comp_rows, nrows)
    for i, d in enumerate(datas):
        assert oracle[i].reshape(-1)[:block].tobytes() == d, f"oracle {i}"
    n = len(datas)
    cp = np.zeros((n, comp_rows, 128), np.uint8)
    for i, c in enumerate(comps):
        cp[i].reshape(-1)[:len(c)] = c
    cp_i8 = (cp.astype(np.int32) - 128).astype(np.int8)
    out = np.asarray(decode_blocks_flat(
        jnp.asarray(cp_i8), jnp.asarray(plans["p_used"]),
        jnp.asarray(plans["p_off"]), jnp.asarray(plans["p0"]),
        jnp.asarray(plans["se"]), jnp.asarray(plans["shift"]),
        jnp.asarray(bands), jnp.asarray(plans["dq"]),
        jnp.asarray(plans["row_a"]), jnp.asarray(plans["dense"]),
        comp_rows=comp_rows, out_rows=nrows, interpret=True,
        static_bands=True))
    for i, d in enumerate(datas):
        assert out[i].reshape(-1)[:block].tobytes() == d, f"static block {i}"


def test_compute_bands_window_fits_small_planes():
    # KB shrinks to the plane when the plane is smaller than KBAND, and
    # the slid window never runs past the plane even when a pass touches
    # its last rows.
    from bitar_tpu.ops.pallas.lz4_decode_flat import (
        KBAND, bands_supported, compute_bands)

    assert bands_supported(128, 1024)      # KB=128 tile on the comp plane
    assert bands_supported(1024, 1024)
    assert not bands_supported(384, 1024)  # 384 % 256 != 0: no clean tiling
    nrows, comp_rows = 1024, 128
    tiles = nrows // 128
    S = 8
    se = np.zeros((S, tiles, 128), np.int16)
    shift = np.zeros((S, tiles, 128), np.int32)
    # One comp pass whose active rows source the END of the comp plane
    # (row_a near comp_rows-1) and one out pass sourcing the end of the
    # output plane.
    se[0, 0, 0] = 0x0080                       # row 0 fully active
    shift[0, 0, 0] = (comp_rows - 1) * 128     # sources last comp row
    se[4, 0, 1] = 0x0080                       # out pass, row 1 active
    shift[4, 0, 1] = (nrows - 2) * 128         # sources last out rows
    plans = {"se": se, "shift": shift,
             "p_used": np.array([8], np.int32),
             "p_off": np.array([0], np.int32),
             "p0": np.array([4], np.int32)}
    bands = compute_bands(plans, comp_rows, nrows)
    mt = max(1, nrows // 1024)
    b0, c0 = int(bands[0]) >> 8, int(bands[0]) & 0xFF
    kb_comp = min(KBAND, comp_rows)
    assert c0 >= 1 and b0 + c0 * kb_comp <= comp_rows
    b4, c4 = int(bands[4 * mt]) >> 8, int(bands[4 * mt]) & 0xFF
    assert c4 >= 1 and b4 + c4 * KBAND <= nrows
    assert b4 % 8 == 0


def test_decompress_device_planned(rng):
    import jax
    with planned_engine() as eng:
        data = (b"device resident " * (BLOCK // 15 + 1))[:BLOCK] + b"\x44" * BLOCK
        unit = eng.compress(data)
        bursts = eng.decompress_device(unit)
        jax.block_until_ready(bursts)
        host = np.concatenate(
            [np.asarray(b).reshape(np.asarray(b).shape[0], -1) for b in bursts])
        got = b"".join(host[i].tobytes()[:int(unit.manifest.raw_len[i])]
                       for i in range(unit.nblocks))
        assert got == data
        eng.recycle(unit)


def test_chunked_plan_build_matches_single(rng, monkeypatch):
    # Huge units plan in bounded chunks; the merged flat wire must decode
    # identically to single-call planning.
    import bitar_tpu as bt
    from bitar_tpu.engine.device import Engine

    data = b"".join([
        (b"chunked planning %d " % i) * (BLOCK // 19 + 1)
        for i in range(10)])[:10 * BLOCK]
    cfg = bt.EngineConfig(codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=8,
                          max_pool_slots=32, use_tpu_kernels=True,
                          interpret=True)
    monkeypatch.setattr(Engine, "_PLAN_CHUNK_BLOCKS", 3)   # force 4 chunks
    with bt.Engine(cfg) as eng:
        unit = eng.compress(data)
        eng.ensure_plans(unit)
        plans = unit.plan_flat
        assert plans is not None and plans["p_used"].shape[0] == 10
        # p_off strictly increasing and consistent with p_used prefix sums
        off = plans["p_off"]
        assert (np.diff(off) == plans["p_used"][:-1]).all()
        out = eng.decompress(unit)
        assert out.tobytes() == data
        eng.recycle(unit)


def test_fill_fragments_periodic_data(rng):
    # Row-fill fragments (plan.cc kFill): the tail of an overlapping
    # match (offset < length) collapses into ~one pass of whole-row
    # copies instead of log-doubling all the way.  Periodic corpora must
    # stay bit-exact AND plan small (the pass count is the decode cost).
    from bitar_tpu.ops.pallas.lz4_decode_flat import (
        attach_dense_planes, decode_flat_numpy)

    block = 128 * 1024
    nrows = block // 128
    cases = {
        "rle": bytes([0x41]) * block,
        "zeros": bytes(block),
        "period3": (b"abc" * (block // 3 + 1))[:block],
        "period7": (b"1234567" * (block // 7 + 1))[:block],
        "period16": (bytes(range(16)) * (block // 16))[:block],
        "rle_mid": (rng.integers(0, 256, 777, np.uint8).tobytes()
                    + bytes([9]) * (block - 1777)
                    + rng.integers(0, 256, 1000, np.uint8).tobytes()),
    }
    for name, raw in cases.items():
        comp = np.asarray(native.lz4_compress(raw))
        se, sh, pu, p0, st, _, dq, ra, dn = native.plan_batch_flat(
            comp, np.zeros(1, np.int64), np.array([len(comp)], np.int32),
            np.array([block], np.int32), np.zeros(1, np.int32),
            nrows, 160, cb=4)
        assert st[0] == 0, (name, st[0])
        P = int(pu[0])
        assert P <= 20, f"{name}: fill rewrite regressed to {P} passes"
        comp_rows = -(-len(comp) // 128)
        plans = attach_dense_planes(
            {"p_used": pu, "p_off": np.zeros(1, np.int32), "p0": p0,
             "se": se[0, :P].reshape(P, nrows // 128, 128),
             "shift": sh[0, :P].reshape(P, nrows // 128, 128)},
            dq, ra, dn)
        out = decode_flat_numpy([comp.tobytes()], plans, comp_rows, nrows)
        assert out.reshape(-1).tobytes()[:block] == raw, name


def test_fill_fragments_fuzz_overlap_matches(rng):
    # Adversarial overlap shapes: random periods/lengths/phases around
    # row boundaries, decoded through the flat numpy oracle.
    from bitar_tpu.ops.pallas.lz4_decode_flat import (
        attach_dense_planes, decode_flat_numpy)

    for trial in range(40):
        period = int(rng.integers(1, 200))
        unit = rng.integers(0, 256, period, np.uint8).tobytes()
        pre = rng.integers(0, 256, int(rng.integers(0, 300)),
                           np.uint8).tobytes()
        n = int(rng.integers(512, 64 * 1024))
        raw = (pre + unit * (n // period + 2))[:n]
        comp = np.asarray(native.lz4_compress(raw))
        nrows = -(-len(raw) // 128)
        se, sh, pu, p0, st, _, dq, ra, dn = native.plan_batch_flat(
            comp, np.zeros(1, np.int64), np.array([len(comp)], np.int32),
            np.array([len(raw)], np.int32), np.zeros(1, np.int32),
            nrows, 160, cb=4)
        if st[0] != 0:
            continue                    # unplannable: host fallback path
        P = int(pu[0])
        comp_rows = -(-len(comp) // 128)
        plans = attach_dense_planes(
            {"p_used": pu, "p_off": np.zeros(1, np.int32), "p0": p0,
             "se": se[0, :P], "shift": sh[0, :P]}, dq, ra, dn)
        out = decode_flat_numpy([comp.tobytes()], plans, comp_rows, nrows)
        assert out.reshape(-1).tobytes()[:len(raw)] == raw, \
            f"trial {trial} period {period}"


def test_identity_dense_and_compacted_wire(rng):
    # dense = -1 blocks (RAW) decode as a verbatim comp-plane copy with
    # no per-byte wire; dq_idx points wire-carrying blocks at rows of a
    # COMPACTED dq/row_a array.  Mixed batch: [RAW, text, RAW] with a
    # 1-row compact wire.
    from bitar_tpu.ops.pallas.lz4_decode_flat import (
        attach_dense_planes, decode_blocks_flat, decode_flat_numpy,
        flatten_batch_plans)
    import jax.numpy as jnp

    block = 16 * 1024
    nrows = block // 128
    raw_blk = rng.integers(0, 256, block, np.uint8).tobytes()
    txt_blk = (b"identity dense wire " * (block // 19 + 1))[:block]
    comp_txt = np.asarray(native.lz4_compress(txt_blk, min_match=6))
    se, sh, pu, p0, st, _, dq, ra, dn = native.plan_batch_flat(
        comp_txt, np.zeros(1, np.int64), np.array([len(comp_txt)], np.int32),
        np.array([block], np.int32), np.zeros(1, np.int32), nrows, 160, cb=4)
    assert st[0] == 0 and dn[0] > 0
    plans = attach_dense_planes(
        flatten_batch_plans(se, sh, pu, p0, nrows), dq, ra, dn)
    # assemble the 3-block batch: RAW blocks have no plan rows, no wire
    datas = [raw_blk, txt_blk, raw_blk]
    comps = [np.frombuffer(raw_blk, np.uint8), comp_txt,
             np.frombuffer(raw_blk, np.uint8)]
    comp_rows = nrows                         # RAW fills the whole plane
    batch = {
        "p_used": np.array([0, int(pu[0]), 0], np.int32),
        "p_off": np.zeros(3, np.int32),
        "p0": np.array([0, int(p0[0]), 0], np.int32),
        "se": plans["se"], "shift": plans["shift"],
        "dq": plans["dq"], "row_a": plans["row_a"],
        "dense": np.array([-1, int(dn[0]), -1], np.int32),
        "dq_idx": np.zeros(3, np.int32),      # all point at wire row 0
    }
    oracle = decode_flat_numpy(comps, batch, comp_rows, nrows)
    for i, d in enumerate(datas):
        assert oracle[i].reshape(-1)[:block].tobytes() == d, f"oracle {i}"
    cp = np.zeros((3, comp_rows, 128), np.uint8)
    for i, c in enumerate(comps):
        cp[i].reshape(-1)[:len(c)] = c
    cp_i8 = (cp.astype(np.int32) - 128).astype(np.int8)
    out = np.asarray(decode_blocks_flat(
        jnp.asarray(cp_i8), jnp.asarray(batch["p_used"]),
        jnp.asarray(batch["p_off"]), jnp.asarray(batch["p0"]),
        jnp.asarray(batch["se"]), jnp.asarray(batch["shift"]), None,
        jnp.asarray(batch["dq"]), jnp.asarray(batch["row_a"]),
        jnp.asarray(batch["dense"]), jnp.asarray(batch["dq_idx"]),
        comp_rows=comp_rows, out_rows=nrows, interpret=True))
    for i, d in enumerate(datas):
        assert out[i].reshape(-1)[:block].tobytes() == d, f"kernel {i}"


def test_pass_economics_by_corpus_class():
    # Decode cost = scheduled + dense passes; these budgets encode the
    # dense-pass + min_match design targets (ARCHITECTURE.md roofline).
    # A planner or encoder regression that re-inflates a class fails here
    # long before a benchmark run would notice.  Locally-seeded rng: the
    # hard caps must not depend on test execution order.
    lrng = np.random.default_rng(2026)
    block = 128 * 1024
    nrows = block // 128
    budgets = {            # (corpus, max effective passes)
        "text": ((b"The quick brown fox jumps over the lazy dog 7. "
                  ) * (block // 47 + 1))[:block],
        "lowent": lrng.integers(0, 16, block, np.uint8).tobytes(),
        "random": lrng.integers(0, 256, block, np.uint8).tobytes(),
        "rle": bytes([7]) * block,
    }
    caps = {"text": 4, "lowent": 2, "random": 2, "rle": 4}
    for name, raw in budgets.items():
        comp = np.asarray(native.lz4_compress(raw, min_match=6))
        se, sh, pu, p0, st, _, dq, ra, dn = native.plan_batch_flat(
            comp, np.zeros(1, np.int64), np.array([len(comp)], np.int32),
            np.array([block], np.int32), np.zeros(1, np.int32),
            nrows, 160, cb=4)
        assert st[0] == 0, name
        eff = int(pu[0]) + int(dn[0])
        assert eff <= caps[name], \
            f"{name}: {eff} effective passes > budget {caps[name]}"


def test_multi_anchor_dense_passes(rng):
    # Rows whose comp cells scatter across the comp plane (matches
    # re-sourced to distant literal regions) need multiple dense
    # anchors; the multi-window wire must absorb them bit-exactly and
    # actually engage more than one dense pass.
    from bitar_tpu.ops.pallas.lz4_decode_flat import (
        attach_dense_planes, decode_flat_numpy)

    block = 32 * 1024
    nrows = block // 128
    # 64 distinct random 48-byte chunks spread through a random preamble,
    # then rows stitched from far-apart chunks: each output row's match
    # sources bottom out in literal regions scattered over the comp
    # plane.
    chunks = [rng.integers(0, 256, 48, np.uint8).tobytes()
              for _ in range(64)]
    pre = b"".join(chunks[i] + rng.integers(0, 256, 80, np.uint8).tobytes()
                   for i in range(64))
    body = b"".join(chunks[(7 * k) % 64] for k in range(200))
    raw = (pre + body)[:block].ljust(block, b"\x00")
    comp = np.asarray(native.lz4_compress(raw))
    se, sh, pu, p0, st, _, dq, ra, dn = native.plan_batch_flat(
        comp, np.zeros(1, np.int64), np.array([len(comp)], np.int32),
        np.array([block], np.int32), np.zeros(1, np.int32),
        nrows, 160, cb=4)
    assert st[0] == 0
    assert int(dn[0]) >= 2, f"expected multi-anchor dense, got {dn[0]}"
    P = int(pu[0])
    comp_rows = -(-len(comp) // 128)
    plans = attach_dense_planes(
        {"p_used": pu, "p_off": np.zeros(1, np.int32), "p0": p0,
         "se": se[0, :P], "shift": sh[0, :P]}, dq, ra, dn)
    out = decode_flat_numpy([comp.tobytes()], plans, comp_rows, nrows)
    assert out.reshape(-1).tobytes()[:block] == raw
