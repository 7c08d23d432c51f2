"""Codec registry: one implementation record per codec.

The analog of the reference's capability table: the hardware advertises
DEFLATE via ``rte_compressdev_info`` and the device validates against it
(``device.cc:353-415``).  Here each codec declares its host (native C++)
entry points and whether the TPU decode kernel can execute it (i.e. it
parses to the SoA sequence-table shape).

Zstd is native in BOTH directions (from-scratch RFC 8878 codec in
``ops/cpu/zstd.cc``, fuzz-validated against the zstandard module): the
decoder's sequence execution rides the TPU plan-execute kernel with
literals from a host-entropy-decoded plane, and the encoder (greedy LZ +
predefined-FSE sequence coding) runs inside the multithreaded C++ batch
engine like lz4/snappy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import Codec, compress_bound
from ..status import Status, StatusError
from .cpu import native


@dataclass(frozen=True)
class CodecImpl:
    codec: Codec
    native_batch: bool       # handled inside bt_batch_* (threads in C++)
    tpu_decode: bool         # parses to sequence tables for the Pallas kernel
    parse_name: str | None   # native parse entry ("lz4"/"snappy") or None


_REGISTRY: dict[Codec, CodecImpl] = {
    Codec.LZ4: CodecImpl(Codec.LZ4, native_batch=True, tpu_decode=True,
                         parse_name="lz4"),
    Codec.SNAPPY: CodecImpl(Codec.SNAPPY, native_batch=True, tpu_decode=True,
                            parse_name="snappy"),
    # Native both ways (from-scratch zstd.cc); TPU-plannable via the
    # decoded-literals plane.
    Codec.ZSTD: CodecImpl(Codec.ZSTD, native_batch=True, tpu_decode=True,
                          parse_name="zstd"),
    Codec.RAW: CodecImpl(Codec.RAW, native_batch=True, tpu_decode=False,
                         parse_name=None),
}


def get_impl(codec: Codec) -> CodecImpl:
    return _REGISTRY[codec]


def parse_tables(codec: Codec, blocks: list[np.ndarray]) -> list[dict[str, np.ndarray]]:
    impl = get_impl(codec)
    if not impl.tpu_decode:
        raise StatusError(Status.NotImplemented(
            f"codec {codec.value} has no TPU decode path"))
    return [native.parse_sequences(b, impl.parse_name) for b in blocks]


# ---------------------------------------------------------------------------
# Host batch entry points (route native vs python-module codecs)


def host_compress_batch(codec: Codec, level: int, src: np.ndarray,
                        src_off: np.ndarray, src_len: np.ndarray,
                        dst: np.ndarray, dst_off: np.ndarray,
                        dst_cap: np.ndarray, nthreads: int = 0,
                        codec_ids: np.ndarray | None = None,
                        min_match: int = 4
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Compress a batch of blocks on the host; returns (lengths, statuses).

    All codecs (zstd included) run in the multithreaded C++ batch engine;
    ``level`` is accepted for API parity (the native zstd encoder is a
    single greedy strategy, the analog of module level 1).
    ``min_match``: smallest match length the LZ4/Snappy encoders emit —
    the decode-cost lever (EngineConfig.min_match).
    """
    del level  # single native strategy; kept for call-site compatibility
    if codec_ids is None:
        codec_ids = np.full(src_len.shape[0], _codec_int(codec), dtype=np.int32)
    dst_len, status = native.batch_run(
        True, "lz4", src, src_off, src_len, dst, dst_off, dst_cap,
        nthreads=nthreads, codec_ids=codec_ids, min_match=min_match)
    return dst_len, status


def host_decompress_batch(codec: Codec, src: np.ndarray, src_off: np.ndarray,
                          src_len: np.ndarray, dst: np.ndarray,
                          dst_off: np.ndarray, dst_cap: np.ndarray,
                          nthreads: int = 0,
                          codec_ids: np.ndarray | None = None
                          ) -> tuple[np.ndarray, np.ndarray]:
    if codec_ids is None:
        codec_ids = np.full(src_len.shape[0], _codec_int(codec), dtype=np.int32)
    # All codecs decompress natively (zstd included: ops/cpu/zstd.cc).
    dst_len, status = native.batch_run(
        False, "lz4", src, src_off, src_len, dst, dst_off, dst_cap,
        nthreads=nthreads, codec_ids=codec_ids)
    return dst_len, status


def _codec_int(codec: Codec) -> int:
    from ..manifest import codec_id
    return codec_id(codec)


def slot_bound(codec: Codec, block_size: int) -> int:
    return compress_bound(codec, block_size)
