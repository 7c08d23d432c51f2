"""TPU match-kernel compression tests (interpreter mode)."""

import numpy as np
import pytest

import bitar_tpu as bt
from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.pallas.lz4_match import DEFAULT_OFFSETS, find_matches

BLOCK = 16 * 1024
NROWS = BLOCK // 128


def run_matcher(datas):
    planes = np.zeros((len(datas), NROWS, 128), np.uint8)
    for i, d in enumerate(datas):
        planes[i].reshape(-1)[:len(d)] = np.frombuffer(d, np.uint8)
    ml, oi = find_matches(planes, nrows=NROWS, interpret=True)
    return np.asarray(ml), np.asarray(oi)


def test_matcher_roundtrip_and_ratios(rng):
    cases = {
        "rle": b"\x42" * BLOCK,
        "pat8": b"abcdefgh" * (BLOCK // 8),
        "struct16": np.repeat(np.arange(BLOCK // 16, dtype=np.uint8),
                              16).tobytes()[:BLOCK],
        "random": bytes(rng.integers(0, 256, BLOCK, dtype=np.uint8)),
        "stride128": bytes(rng.integers(0, 256, 128, dtype=np.uint8)
                           ) * (BLOCK // 128),
    }
    datas = list(cases.values())
    ml, oi = run_matcher(datas)
    ratios = {}
    for i, (name, d) in enumerate(cases.items()):
        comp = native.lz4_emit_sequences(
            d, ml[i].reshape(-1), oi[i].reshape(-1), DEFAULT_OFFSETS)
        back = native.lz4_decompress(comp, BLOCK + 1)
        assert back.tobytes() == d, name  # standard-format round trip
        # interop: the oracle decoder (pyarrow path exercised elsewhere)
        ratios[name] = BLOCK / len(comp)
    assert ratios["rle"] > 100
    assert ratios["pat8"] > 100
    assert ratios["struct16"] > 5
    assert ratios["stride128"] > 50
    assert 0.95 < ratios["random"] <= 1.01


def test_matcher_hint_verification_is_safe(rng):
    # Corrupt hints must never corrupt output: the emitter verifies.
    d = bytes(rng.integers(0, 8, BLOCK, dtype=np.uint8))
    mlen = np.full(BLOCK, 64, np.int32)             # lie: match everywhere
    oidx = rng.integers(0, len(DEFAULT_OFFSETS), BLOCK).astype(np.int32)
    comp = native.lz4_emit_sequences(d, mlen, oidx, DEFAULT_OFFSETS)
    assert native.lz4_decompress(comp, BLOCK + 1).tobytes() == d


def test_engine_tpu_matcher_end_to_end(rng):
    cfg = bt.EngineConfig(
        codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=4,
        max_pool_slots=32, use_tpu_kernels=True, interpret=True,
        compress_matcher="tpu")
    with bt.Engine(cfg) as eng:
        data = (b"\x11" * BLOCK                            # RLE
                + bytes(rng.integers(0, 256, 128, dtype=np.uint8)) * (BLOCK // 128)
                + bytes(rng.integers(0, 256, BLOCK, dtype=np.uint8)))
        unit = eng.compress(data)
        assert unit.manifest.ratio() > 2.0
        out = eng.decompress(unit)
        assert out.tobytes() == data
        eng.recycle(unit)


def test_snappy_emitter_roundtrip_and_interop(rng):
    # The match kernel's hints are codec-agnostic; the Snappy emitter
    # produces a standard stream (round-trips through our decoder AND a
    # foreign one).
    cases = {
        "rle": b"\x42" * BLOCK,
        "pat8": b"abcdefgh" * (BLOCK // 8),
        "random": bytes(rng.integers(0, 256, BLOCK, dtype=np.uint8)),
    }
    datas = list(cases.values())
    ml, oi = run_matcher(datas)
    for i, (name, d) in enumerate(cases.items()):
        comp = native.snappy_emit_sequences(
            d, ml[i].reshape(-1), oi[i].reshape(-1), DEFAULT_OFFSETS)
        back = native.snappy_decompress(comp, BLOCK + 1)
        assert back.tobytes() == d, name
        try:
            import pyarrow as pa
            assert pa.decompress(comp.tobytes(), decompressed_size=BLOCK,
                                 codec="snappy").to_pybytes() == d, name
        except ImportError:
            pass
    rle = native.snappy_emit_sequences(
        datas[0], ml[0].reshape(-1), oi[0].reshape(-1), DEFAULT_OFFSETS)
    # Snappy copies cap at 64 bytes (3-byte tag per 64), so RLE tops out
    # near 64/3 ~ 21x — unlike LZ4's unbounded match lengths.
    assert BLOCK / len(rle) > 20


def test_engine_tpu_matcher_snappy_end_to_end(rng):
    cfg = bt.EngineConfig(
        codec=bt.Codec.SNAPPY, block_size=BLOCK, burst_size=4,
        max_pool_slots=32, use_tpu_kernels=True, interpret=True,
        compress_matcher="tpu")
    with bt.Engine(cfg) as eng:
        data = (b"\x11" * BLOCK
                + bytes(rng.integers(0, 256, 128, dtype=np.uint8)) * (BLOCK // 128)
                + bytes(rng.integers(0, 256, BLOCK, dtype=np.uint8)))
        unit = eng.compress(data)
        assert unit.manifest.ratio() > 2.0
        out = eng.decompress(unit)
        assert out.tobytes() == data
        eng.recycle(unit)


def test_config_rejects_bad_matcher_combos():
    st = bt.EngineConfig(codec=bt.Codec.ZSTD,
                         compress_matcher="tpu").validate(bt.capabilities_for_platform("cpu"))
    assert not st.ok() and "LZ4" in st.message
    st = bt.EngineConfig(block_size=1024,
                         compress_matcher="tpu").validate(bt.capabilities_for_platform("cpu"))
    assert not st.ok()
    with pytest.raises(Exception):
        bt.EngineConfig(compress_matcher="gpu").validate(
            bt.capabilities_for_platform("cpu")).raise_if_error()


def test_sort_matcher_arbitrary_offsets(rng):
    # The sort matcher finds matches at offsets the candidate table
    # doesn't contain (e.g. a 777-byte period), and its hints are the
    # most-recent previous occurrence (minimal offset).
    from bitar_tpu.ops.pallas.lz4_match_sort import find_matches_sorted

    period = 777                         # not in DEFAULT_OFFSETS
    base = bytes(rng.integers(0, 256, period, dtype=np.uint8))
    data = (base * (BLOCK // period + 1))[:BLOCK]
    plane = np.zeros((1, BLOCK), np.uint8)
    plane[0] = np.frombuffer(data, np.uint8)
    off = np.asarray(find_matches_sorted(plane, length=BLOCK))[0]
    assert (off[period:] == period).mean() > 0.95   # near-everywhere hits
    mlen = np.where(off > 0, 4, 0).astype(np.int32)
    comp = native.lz4_emit_sequences(data, mlen, off.astype(np.int32), None)
    assert native.lz4_decompress(comp, BLOCK + 1).tobytes() == data
    # Ceiling is BLOCK/period ~ 21 (the first period is incompressible);
    # the candidate-offset matcher gets ~1.0 on this data.
    assert BLOCK / len(comp) > 15

    # Host-matcher parity on text: exact greedy should land within a few
    # percent of the host hash matcher's ratio.
    text = (b"the quick brown fox jumps over the lazy dog %d " * 400)
    text = (text % tuple(range(400)))[:BLOCK]
    plane[0] = np.frombuffer(text, np.uint8)
    off = np.asarray(find_matches_sorted(plane, length=BLOCK))[0]
    mlen = np.where(off > 0, 4, 0).astype(np.int32)
    comp = native.lz4_emit_sequences(text, mlen, off.astype(np.int32), None)
    assert native.lz4_decompress(comp, BLOCK + 1).tobytes() == text
    host = native.lz4_compress(text)
    assert len(comp) <= len(host) * 1.1


def test_engine_sort_matcher_end_to_end(rng):
    cfg = bt.EngineConfig(
        codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=4,
        max_pool_slots=32, use_tpu_kernels=True, interpret=True,
        compress_matcher="tpu-sort")
    with bt.Engine(cfg) as eng:
        data = (b"\x11" * BLOCK
                + bytes(rng.integers(0, 256, 333, dtype=np.uint8))
                  * (BLOCK // 333 + 1))[:2 * BLOCK]
        unit = eng.compress(data)
        assert unit.manifest.ratio() > 5.0
        out = eng.decompress(unit)
        assert out.tobytes() == data
        eng.recycle(unit)
