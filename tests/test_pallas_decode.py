"""Pallas decode kernel tests (interpreter mode on CPU).

Uses tiny blocks: interpret mode executes every loop iteration through the
emulator, so block sizes here stay small; full 128 KiB blocks are exercised
on real TPU hardware by bench.py and the engine integration tests.
"""

import numpy as np
import pytest

from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.pallas import layout
from bitar_tpu.ops.pallas.lz4_decode import decode_blocks

KEYS = ("lit_ptr", "lit_len", "off", "mlen", "out_pos")


def run_decode(comps: list[bytes], block: int, codec: str = "lz4"):
    tables = [native.parse_sequences(c, codec) for c in comps]
    t, nseq = layout.pad_tables(tables, KEYS)
    rc = layout.padded_rows(max(len(c) for c in comps))
    ro = layout.padded_rows(block)
    planes = layout.batch_to_planes([np.frombuffer(bytes(c), np.uint8) for c in comps], rc)
    out = decode_blocks(
        planes, nseq, t["lit_ptr"], t["lit_len"], t["off"], t["mlen"],
        t["out_pos"], comp_rows=rc, out_rows=ro,
        seq_cap=t["lit_ptr"].shape[1], interpret=True)
    return np.asarray(out)


def test_lz4_decode_mixed_blocks(rng):
    block = 384
    datas = [
        (b"hello world! hello hello " * 40)[:block],
        bytes(rng.integers(0, 256, block, dtype=np.uint8)),  # pure literal
        b"\x07" * block,                                     # off=1 RLE
        (b"abcdefgh" * 60)[:block],                          # off=8 overlap
        (b"ab" * 200)[:block],                               # off=2 overlap
    ]
    comps = [native.lz4_compress(d).tobytes() for d in datas]
    out = run_decode(comps, block)
    for i, d in enumerate(datas):
        assert layout.plane_to_bytes(out[i], block).tobytes() == d, f"block {i}"


def test_lz4_decode_ragged_tail(rng):
    # Blocks of different raw lengths in one batch (the manifest's ragged
    # tail case): decode fills only each block's raw_len bytes.
    block = 256
    datas = [(b"abcabcabc" * 50)[:block], (b"xyz" * 30)[:77]]
    comps = [native.lz4_compress(d).tobytes() for d in datas]
    out = run_decode(comps, block)
    assert layout.plane_to_bytes(out[0], block).tobytes() == datas[0]
    assert layout.plane_to_bytes(out[1], 77).tobytes() == datas[1]


def test_snappy_tables_same_kernel(rng):
    # Snappy parses into the same SoA row shape; the one kernel executes both.
    block = 320
    datas = [
        (b"snappy snappy snap " * 30)[:block],
        bytes(rng.integers(0, 3, block, dtype=np.uint8)),
        b"\xff" * block,
    ]
    comps = [native.snappy_compress(d).tobytes() for d in datas]
    out = run_decode(comps, block, codec="snappy")
    for i, d in enumerate(datas):
        assert layout.plane_to_bytes(out[i], block).tobytes() == d, f"block {i}"


def test_lz4_oracle_cross_check(rng):
    # Kernel output must match the native decoder byte for byte (the
    # memcmp oracle of the reference demo app, demo_app.cc:534-543).
    block = 300
    data = bytes(rng.integers(0, 8, block, dtype=np.uint8))
    comp = native.lz4_compress(data).tobytes()
    out = run_decode([comp], block)
    kernel_bytes = layout.plane_to_bytes(out[0], block).tobytes()
    native_bytes = native.lz4_decompress(np.frombuffer(comp, np.uint8), block).tobytes()
    assert kernel_bytes == native_bytes == data


@pytest.mark.parametrize("pattern_len", [1, 2, 3, 5, 8, 16, 127, 128, 129])
def test_overlap_offsets(pattern_len):
    # Every overlap regime: offset < 128 (doubling path), == 128, > 128.
    block = 256
    pattern = bytes(range(pattern_len)) * (block // pattern_len + 1)
    data = pattern[:block]
    comp = native.lz4_compress(data).tobytes()
    out = run_decode([comp], block)
    assert layout.plane_to_bytes(out[0], block).tobytes() == data


def test_layout_roundtrip(rng):
    data = rng.integers(0, 256, 1000, dtype=np.uint8)
    rows = layout.padded_rows(1000)
    plane = layout.bytes_to_plane(data, rows)
    np.testing.assert_array_equal(layout.plane_to_bytes(plane, 1000), data)


def test_pad_tables():
    t1 = {k: np.arange(3, dtype=np.int32) for k in KEYS}
    t2 = {k: np.arange(200, dtype=np.int32) for k in KEYS}
    t, nseq = layout.pad_tables([t1, t2], KEYS)
    assert nseq.tolist() == [3, 200]
    assert t["off"].shape == (2, 256)  # rounded to lane multiple
    assert t["off"][0, 2] == 2 and t["off"][0, 3] == 0
