import numpy as np
import pytest

from bitar_tpu.config import Checksum, Codec
from bitar_tpu.manifest import (
    BlockManifest,
    CompressedBuffers,
    checksum_of,
    codec_from_id,
    codec_id,
)
from bitar_tpu.status import StatusError


def test_plan_shapes():
    m = BlockManifest.plan(1000, 256)
    assert m.nblocks == 4
    assert m.raw_len.tolist() == [256, 256, 256, 232]
    assert m.validate().ok()
    assert m.raw_off.tolist() == [0, 256, 512, 768]


def test_plan_exact_and_empty():
    assert BlockManifest.plan(512, 256).raw_len.tolist() == [256, 256]
    m = BlockManifest.plan(0, 256)
    assert m.nblocks == 1 and m.raw_len.tolist() == [0]
    assert m.validate().ok()


def test_plan_rejects_bad_args():
    with pytest.raises(StatusError):
        BlockManifest.plan(-1, 256)
    with pytest.raises(StatusError):
        BlockManifest.plan(10, 0)


def test_codec_ids_roundtrip():
    for c in Codec:
        assert codec_from_id(codec_id(c)) == c


def test_serialization_roundtrip():
    m = BlockManifest.plan(100_000, 4096)
    m.comp_len[:] = np.arange(m.nblocks) + 10
    m.codec_ids[:] = codec_id(Codec.LZ4)
    m.checksums[:] = 0xDEADBEEF
    m.checksum_kind = Checksum.CRC32
    blob = m.to_bytes()
    back = BlockManifest.from_bytes(blob)
    assert back.nblocks == m.nblocks
    assert back.total_raw == m.total_raw
    assert back.block_size == m.block_size
    assert back.checksum_kind == Checksum.CRC32
    np.testing.assert_array_equal(back.comp_len, m.comp_len)
    np.testing.assert_array_equal(back.checksums, m.checksums)


def test_serialization_detects_corruption():
    blob = bytearray(BlockManifest.plan(1000, 256).to_bytes())
    blob[10] ^= 0xFF
    with pytest.raises(StatusError):
        BlockManifest.from_bytes(bytes(blob))


def test_compressed_buffers_container():
    m = BlockManifest.plan(300, 100)
    m.comp_len[:] = [5, 7, 3]
    payload = np.arange(15, dtype=np.uint8)
    cb = CompressedBuffers(manifest=m, packed=payload)
    assert cb.block(1).tolist() == [5, 6, 7, 8, 9, 10, 11]
    back = CompressedBuffers.from_bytes(cb.to_bytes())
    np.testing.assert_array_equal(back.packed, payload)
    assert back.manifest.total_raw == 300


def test_payload_crc_detects_corruption():
    m = BlockManifest.plan(300, 100)
    m.comp_len[:] = [5, 7, 3]
    cb = CompressedBuffers(manifest=m, packed=np.arange(15, dtype=np.uint8))
    blob = bytearray(cb.to_bytes())
    blob[-6] ^= 0x01            # a payload byte, not the manifest header
    with pytest.raises(StatusError, match="payload CRC"):
        CompressedBuffers.from_bytes(bytes(blob))
    # legacy containers (no trailer) still import
    legacy = cb.to_bytes()[:-4]
    back = CompressedBuffers.from_bytes(legacy)
    np.testing.assert_array_equal(back.packed, np.arange(15, dtype=np.uint8))


def test_checksum_kinds():
    data = b"hello block"
    assert checksum_of(Checksum.NONE, data) == 0
    assert checksum_of(Checksum.CRC32, data) != 0
    assert checksum_of(Checksum.ADLER32, data) != 0
    assert checksum_of(Checksum.CRC32, data) != checksum_of(Checksum.ADLER32, data)
