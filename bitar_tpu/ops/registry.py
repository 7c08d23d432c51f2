"""Codec registry: one implementation record per codec.

The analog of the reference's capability table: the hardware advertises
DEFLATE via ``rte_compressdev_info`` and the device validates against it
(``device.cc:353-415``).  Here each codec declares its host (native C++)
entry points and whether the TPU decode kernel can execute it (i.e. it
parses to the SoA sequence-table shape).

Zstd decompression is native (from-scratch RFC 8878 decoder in
``ops/cpu/zstd.cc``, fuzz-validated against the zstandard module) and its
sequence execution rides the TPU plan-execute kernel with literals from a
host-entropy-decoded plane; zstd COMPRESSION rides the environment's
``zstandard`` module over a thread pool.
"""

from __future__ import annotations

import concurrent.futures
import os
import threading
from dataclasses import dataclass

import numpy as np

from ..config import Codec, compress_bound
from ..status import Status, StatusError
from .cpu import native

try:
    import zstandard as _zstd
except ImportError:  # pragma: no cover - zstandard is environment-provided
    _zstd = None


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
    # Decompression is native (from-scratch zstd.cc) and TPU-plannable via
    # the decoded-literals plane; compression rides the zstandard module.
    Codec.ZSTD: CodecImpl(Codec.ZSTD, native_batch=False, tpu_decode=True,
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


def _zstd_pool() -> concurrent.futures.ThreadPoolExecutor:
    global _ZSTD_POOL
    try:
        return _ZSTD_POOL
    except NameError:
        _ZSTD_POOL = concurrent.futures.ThreadPoolExecutor(os.cpu_count() or 4)
        return _ZSTD_POOL


def host_compress_batch(codec: Codec, level: int, src: np.ndarray,
                        src_off: np.ndarray, src_len: np.ndarray,
                        dst: np.ndarray, dst_off: np.ndarray,
                        dst_cap: np.ndarray, nthreads: int = 0,
                        codec_ids: np.ndarray | None = None
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Compress a batch of blocks on the host; returns (lengths, statuses).

    Dispatches native codecs to the multithreaded C++ batch engine and zstd
    blocks to the zstandard module over a thread pool (the module releases
    the GIL during compression).
    """
    if codec_ids is None:
        codec_ids = np.full(src_len.shape[0], _codec_int(codec), dtype=np.int32)
    dst_len, status = native.batch_run(
        True, "lz4", src, src_off, src_len, dst, dst_off, dst_cap,
        nthreads=nthreads, codec_ids=codec_ids)
    _run_zstd(True, level, codec_ids, src, src_off, src_len,
              dst, dst_off, dst_cap, dst_len, status)
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


_ZSTD_ID = 2


def _codec_int(codec: Codec) -> int:
    from ..manifest import codec_id
    return codec_id(codec)


_ZSTD_TLS = threading.local()


def _zstd_ctx(level: int):
    """Thread-local ZstdCompressor reuse: context creation costs ~1 ms,
    which dominated per-block compression (measured 0.12 GB/s with a
    fresh context per 128 KiB block on 4 cores)."""
    cache = getattr(_ZSTD_TLS, "c", None)
    if cache is None:
        cache = _ZSTD_TLS.c = {}
    ctx = cache.get(level)
    if ctx is None:
        ctx = cache[level] = _zstd.ZstdCompressor(level=level)
    return ctx


def _zstd_dctx():
    ctx = getattr(_ZSTD_TLS, "d", None)
    if ctx is None:
        ctx = _ZSTD_TLS.d = _zstd.ZstdDecompressor()
    return ctx


def _run_zstd(compress: bool, level: int, codec_ids, src, src_off, src_len,
              dst, dst_off, dst_cap, dst_len, status) -> None:
    idxs = [i for i in range(codec_ids.shape[0]) if codec_ids[i] == _ZSTD_ID]
    if not idxs:
        return
    if _zstd is None:
        for i in idxs:
            status[i] = Status.NotImplemented("").to_int() or -10
        return

    def work(i: int):
        s = bytes(src[src_off[i]:src_off[i] + src_len[i]])
        try:
            if compress:
                out = _zstd_ctx(max(1, level)).compress(s)
            else:
                out = _zstd_dctx().decompress(
                    s, max_output_size=int(dst_cap[i]))
            if len(out) > dst_cap[i]:
                status[i] = -6  # CAPACITY
                return
            dst[dst_off[i]:dst_off[i] + len(out)] = np.frombuffer(out, np.uint8)
            dst_len[i] = len(out)
            status[i] = 0
        except Exception:
            status[i] = -5  # IO_ERROR
            dst_len[i] = 0

    list(_zstd_pool().map(work, idxs))


def slot_bound(codec: Codec, block_size: int) -> int:
    return compress_bound(codec, block_size)
