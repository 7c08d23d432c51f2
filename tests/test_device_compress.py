"""Device-side LZ4 compression (ops/device_compress.py).

Every emitted stream must be standard LZ4 decodable by the host codec
(the oracle, as for the decode kernels) and byte-exact on round-trip —
including tail blocks, tiny blocks, segment-boundary straddles, and
hostile random data.  Reference analog: the demo app's memcmp oracle
(``demo_app.cc:534-543``) applied to the compress direction.
"""

import numpy as np
import pytest

from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.device_compress import compress_blocks_device, lz4_bound


def roundtrip(planes: np.ndarray, lengths, **kw):
    """Emit + decode every block, honoring the caller contract: rows
    whose size >= raw length (or > the emission width) are fallback —
    the engine stores them RAW and never reads their emitted bytes."""
    kw.setdefault("interpret", True)
    fmt = kw.get("fmt", "lz4")
    decode = (native.lz4_decompress if fmt == "lz4"
              else native.snappy_decompress)
    out, sizes = compress_blocks_device(
        planes, np.asarray(lengths, np.int32), **kw)
    out, sizes = np.asarray(out), np.asarray(sizes)
    for i, ln in enumerate(lengths):
        if fmt == "lz4":
            assert sizes[i] <= lz4_bound(int(ln)), f"block {i} oversize"
        if sizes[i] >= ln or sizes[i] > out.shape[1]:
            continue                          # fallback: stored RAW
        dec = np.asarray(decode(out[i, :sizes[i]], int(ln)))
        assert dec.tobytes() == planes[i, :ln].tobytes(), f"block {i}"
    return sizes


def _plane(data: bytes, width: int) -> np.ndarray:
    p = np.zeros(width, np.uint8)
    p[:len(data)] = np.frombuffer(data, np.uint8)
    return p


def test_classes_roundtrip(rng):
    L = 4096
    blocks = [
        (b"The quick brown fox jumps over the lazy dog 42. "
         * (L // 48 + 1))[:L],
        bytes([5]) * L,
        rng.integers(0, 256, L, np.uint8).tobytes(),
        rng.integers(0, 4, L, np.uint8).tobytes(),
        (b"abcdefgh" * (L // 8))[:L],
    ]
    planes = np.stack([_plane(b, L) for b in blocks])
    sizes = roundtrip(planes, [L] * len(blocks), seg=256, min_match=6)
    assert sizes[0] < L // 8, "periodic text must compress"
    assert sizes[1] < L // 16, "RLE must compress"


def test_tail_and_tiny_blocks(rng):
    L = 1024
    datas = [b"hello world " * 30, b"tiny", b"", b"1234567890123",
             b"a" * 13, b"ab" * 40]
    datas = [d[:L] for d in datas if len(d) <= L]
    planes = np.stack([_plane(d, L) for d in datas])
    roundtrip(planes, [len(d) for d in datas], seg=128, min_match=6)


def test_segment_boundary_matches(rng):
    # Runs and periods placed to straddle segment boundaries: matches
    # must truncate cleanly and literals must merge across segments.
    L, seg = 2048, 256
    b = bytearray(rng.integers(0, 256, L, np.uint8).tobytes())
    b[seg - 40: seg + 40] = b"Z" * 80                 # run across boundary
    b[2 * seg - 7: 2 * seg + 7] = b"ABCDEFGHIJKLMN"   # literals at boundary
    b[3 * seg: 3 * seg + 64] = bytes(b[0:64])         # long-distance match
    planes = _plane(bytes(b), L)[None]
    roundtrip(planes, [L], seg=seg, min_match=6)


@pytest.mark.parametrize("min_match", [4, 6, 8])
def test_min_match_knob(rng, min_match):
    L = 1024
    data = (b"abcdef" * 200)[:L]
    planes = _plane(data, L)[None]
    roundtrip(planes, [L], seg=128, min_match=min_match)


def test_fuzz_mixtures(rng):
    # Randomized block mixtures: random spans, runs, copies, text.
    L = 2048
    n = 16
    planes = np.zeros((n, L), np.uint8)
    lengths = []
    for i in range(n):
        buf = bytearray()
        while len(buf) < L:
            k = int(rng.integers(0, 4))
            ln = int(rng.integers(1, 300))
            if k == 0:
                buf += bytes(rng.integers(0, 256, ln, np.uint8))
            elif k == 1:
                buf += bytes([int(rng.integers(0, 256))]) * ln
            elif k == 2 and buf:
                start = int(rng.integers(0, len(buf)))
                buf += bytes(buf[start:start + ln])
            else:
                buf += (b"lorem ipsum %d " % i) * (ln // 14 + 1)
        ln = int(rng.integers(1, L + 1))
        planes[i, :ln] = np.frombuffer(bytes(buf[:L]), np.uint8)[:ln]
        lengths.append(ln)
    roundtrip(planes, lengths, seg=256, min_match=6)
    roundtrip(planes, lengths, seg=256, min_match=6, fmt="snappy")


def test_engine_device_matcher_roundtrip(rng):
    # compress_matcher="device": full offload through the Engine —
    # compressed bytes land in arena slots device-side; decode must be
    # bit-exact, incompressible blocks store RAW.
    import bitar_tpu as bt

    bs = 16384
    data = (
        (b"engine device matcher %d " % 9) * (bs // 24 + 1))[:bs] \
        + bytes([3]) * bs \
        + rng.integers(0, 256, bs, np.uint8).tobytes() \
        + (b"tail block " * 64)
    cfg = bt.EngineConfig(
        codec=bt.Codec.LZ4, block_size=bs, burst_size=8, max_pool_slots=64,
        use_tpu_kernels=True, interpret=True, compress_matcher="device")
    with bt.Engine(cfg) as eng:
        unit = eng.compress(data)
        m = unit.manifest
        from bitar_tpu.manifest import codec_id as cid
        import bitar_tpu as bt2
        assert int(m.codec_ids[2]) == cid(bt2.Codec.RAW), "random block RAW"
        assert int(m.codec_ids[0]) == cid(bt2.Codec.LZ4), "text block LZ4"
        assert m.ratio() > 1.5
        out = eng.decompress(unit)
        assert out.tobytes() == data
        # serialization carries the device-emitted bytes faithfully
        blob = unit.to_host().to_bytes()
        eng.recycle(unit)
        from bitar_tpu.manifest import CompressedBuffers
        unit2 = eng.import_unit(CompressedBuffers.from_bytes(bytes(blob)))
        assert eng.decompress(unit2).tobytes() == data
        eng.recycle(unit2)


def test_engine_deferred_commit_roundtrip(rng):
    # commit="deferred": compress leaves bytes in pool staging (the
    # reference contract); first device decode uploads them.  Bit-exact
    # on both the host and kernel decode paths.
    import bitar_tpu as bt

    data = (b"deferred commit payload %d " % 5) * 2000
    for use_tpu in (False, True):
        cfg = bt.EngineConfig(
            codec=bt.Codec.LZ4, block_size=16384, burst_size=8,
            max_pool_slots=64, use_tpu_kernels=use_tpu, interpret=use_tpu,
            commit="deferred")
        with bt.Engine(cfg) as eng:
            unit = eng.compress(data)
            assert not unit._committed
            out = eng.decompress(unit)
            assert out.tobytes() == data
            if use_tpu:
                assert unit._committed, "device decode must commit"
            # second decompress reuses the committed slots
            assert eng.decompress(unit).tobytes() == data
            eng.recycle(unit)


def test_sizes_match_stream(rng):
    # The closed-form sizes must equal the true stream extent: decode
    # with a one-byte-short size must fail or mismatch.
    L = 1024
    data = (b"xyzzy " * 400)[:L]
    planes = _plane(data, L)[None]
    out, sizes = compress_blocks_device(
        planes, np.array([L], np.int32), seg=128, min_match=6,
        interpret=True)
    out, sz = np.asarray(out), int(np.asarray(sizes)[0])
    assert (out[0, sz:] == 0).all(), "bytes past total must be zero"
    try:
        dec = np.asarray(native.lz4_decompress(out[0, :sz - 1], L))
        assert dec.tobytes() != data, "short stream decoded identically"
    except Exception:
        pass


def test_full_width_emits_all_rows(rng):
    # Explicit worst-case out_width: EVERY row (even incompressible)
    # must carry a decodable stream — the legacy full-width contract.
    L = 2048
    blocks = [rng.integers(0, 256, L, np.uint8).tobytes(),
              bytes([9]) * L]
    planes = np.stack([_plane(b, L) for b in blocks])
    out, sizes = compress_blocks_device(
        planes, np.array([L, L], np.int32), seg=256, min_match=6,
        out_width=-(-lz4_bound(L) // 128) * 128, interpret=True)
    out, sizes = np.asarray(out), np.asarray(sizes)
    for i in range(2):
        dec = np.asarray(native.lz4_decompress(out[i, :sizes[i]], L))
        assert dec.tobytes() == planes[i].tobytes()


def test_offset_detector():
    # The detector must find a working (multiple-of-period) offset for
    # periodic data regardless of stride alignment, and nothing for
    # random data.
    from bitar_tpu.ops.pallas.lz4_match_dyn import detect_offsets

    L = 64 * 1024
    rng = np.random.default_rng(7)
    period47 = (b"The quick brown fox jumps over the lazy dog 7. "
                * (L // 47 + 1))[:L]
    assert period47[:47] == period47[47:94], "corpus period must be 47"
    rle = bytes([7]) * L
    rand = rng.integers(0, 256, L, np.uint8).tobytes()
    planes = np.stack([np.frombuffer(x, np.uint8)
                       for x in (period47, rle, rand)])
    offs, cnt = detect_offsets(planes)
    offs, cnt = np.asarray(offs), np.asarray(cnt)
    assert offs[0, 0] % 47 == 0 and offs[0, 0] > 0, "text period multiple"
    assert offs[0, 0] <= 94, "halving refinement must shrink the offset"
    assert offs[1, 0] == 1, "RLE refines to offset 1"
    assert (offs[2] == 0).all(), "random data must detect nothing"
    # detected offsets are byte-true match distances for periodic data
    for row, data in ((0, period47), (1, rle)):
        d = int(offs[row, 0])
        assert data[d:] == data[:-d]


def test_adaptive_width_fallback_contract(rng):
    # Default (adaptive) width sizes the emission plane to compressible
    # blocks only; incompressible rows report their true size and are
    # fallback.  The emitted compressible row still decodes.
    L = 4096
    good = (b"abcabcabd " * (L // 10 + 1))[:L]
    bad = rng.integers(0, 256, L, np.uint8).tobytes()
    planes = np.stack([_plane(good, L), _plane(bad, L)])
    out, sizes = compress_blocks_device(
        planes, np.array([L, L], np.int32), seg=256, min_match=6,
        interpret=True)
    out, sizes = np.asarray(out), np.asarray(sizes)
    assert sizes[1] >= L, "random block must be fallback"
    assert out.shape[1] < lz4_bound(L), "width must shrink to real sizes"
    assert sizes[0] < L
    dec = np.asarray(native.lz4_decompress(out[0, :sizes[0]], L))
    assert dec.tobytes() == planes[0].tobytes()


def test_fft_detector_finds_non_stride_periods(rng):
    # The sampled detector only sees stride-multiple deltas; a period
    # whose lcm with 64 exceeds the offset window is invisible to it
    # (e.g. 1338 = 2 * 669).  detect_fft adds autocorrelation
    # candidates at lag resolution 1.
    L = 16384
    base = rng.integers(32, 127, 1338, np.uint8)
    p0 = np.tile(base, L // 1338 + 1)[:L]
    base2 = rng.integers(32, 127, 137, np.uint8)
    p1 = np.tile(base2, L // 137 + 1)[:L]
    planes = np.stack([p0, p1])
    sizes = roundtrip(planes, [L, L], seg=1024, out_width=4096,
                      detect_fft=True)
    assert sizes[0] < L // 4, "period-1338 block should compress >= 4x"
    assert sizes[1] < L // 16, "period-137 block should compress >= 16x"


def test_fft_sample_mode(rng):
    # detect_fft="sample" runs the rfft on 8 representative blocks and
    # broadcasts the union of lags; a homogeneous corpus compresses
    # identically to the full-FFT mode at ~1/32 the detect cost.
    L = 16384
    base = rng.integers(32, 127, 1338, np.uint8)
    blocks = np.stack([np.tile(base, L // 1338 + 1)[:L] for _ in range(4)])
    for i in range(4):
        blocks[i, :8] = i
    sizes = roundtrip(blocks, [L] * 4, seg=1024, out_width=4096,
                      detect_fft="sample")
    assert (sizes < L // 4).all()


def test_fft_k_more_peaks(rng):
    # fft_k widens the autocorrelation candidate set: a block carrying
    # TWO interleaved periods needs both lags.  k=6 is the shipped
    # default (markdown sweep 2026-08-20: ratio 3.305 @ k=2 -> 3.356 @
    # k=6 at equal device time; saturates past ~6).
    L = 16384
    b1 = rng.integers(32, 127, 1338, np.uint8)
    b2 = rng.integers(32, 127, 2470, np.uint8)
    half = L // 2
    p = np.concatenate([np.tile(b1, half // 1338 + 1)[:half],
                        np.tile(b2, half // 2470 + 1)[:half]])
    planes = p[None, :]
    sizes = roundtrip(planes, [L], seg=1024, out_width=8192,
                      detect_fft=True, fft_k=6)
    assert sizes[0] < L // 3, "both periods should be matched via fft_k=6"


def test_partial_parse_on_wcap_overflow(rng):
    # A segment with more than wcap sequences keeps its first wcap and
    # emits the rest as literals: the stream stays valid LZ4 and total
    # stays exact (overflow is a ratio event, not a RAW event).
    L = 4096
    # Dense short repeats -> many sequences per 1024-byte segment.
    pat = rng.integers(32, 127, 24, np.uint8)
    chunks = []
    while sum(len(c) for c in chunks) < L:
        chunks.append(pat)
        chunks.append(rng.integers(128, 255, 9, np.uint8))
    p = np.concatenate(chunks)[:L].astype(np.uint8)
    planes = p[None, :]
    sizes = roundtrip(planes, [L], seg=1024, out_width=4096,
                      offsets=(33,))
    # With offset 33 (= 24 + 9) every pat repeat matches: far more than
    # 8 sequences per segment; the partial parse must still round-trip
    # (asserted inside roundtrip) and report a real size, not L + 1.
    assert sizes[0] != L + 1


def test_engine_detect_fft_knob(rng):
    import bitar_tpu as bt

    bs = 16384
    base = rng.integers(32, 127, 1338, np.uint8)
    block = np.tile(base, bs // 1338 + 1)[:bs].tobytes()
    data = block + rng.integers(0, 256, bs, np.uint8).tobytes()
    cfg = bt.EngineConfig(
        codec=bt.Codec.LZ4, block_size=bs, burst_size=8, max_pool_slots=64,
        use_tpu_kernels=True, interpret=True, compress_matcher="device",
        detect_fft=True)
    with bt.Engine(cfg) as eng:
        unit = eng.compress(data)
        assert unit.manifest.ratio() > 1.8, (
            "period-1338 block should lift the unit ratio via detect_fft")
        assert eng.decompress(unit).tobytes() == data
        eng.recycle(unit)


def test_packed_emitter_matches_xla_materialize(rng):
    # The packed-lane Pallas emitter must reproduce the XLA materialize
    # byte-for-byte on fuzzed layouts: mixed content classes, tail
    # blocks, and dense partial parses all in one batch.
    import jax.numpy as jnp

    from bitar_tpu.ops.device_compress import _match_parse, materialize
    from bitar_tpu.ops.pallas.lz4_emit import materialize_pallas_packed

    L = 8192
    blocks = [
        (b"packed emitter ab " * (L // 18 + 1))[:L],
        bytes([9]) * L,
        rng.integers(0, 256, L, np.uint8).tobytes(),
        np.tile(rng.integers(32, 127, 517, np.uint8), L // 517 + 1)[:L]
        .tobytes(),
    ]
    planes = jnp.asarray(
        np.stack([np.frombuffer(b, np.uint8) for b in blocks]))
    lengths = jnp.asarray([L, L, L, L - 100], jnp.int32)
    lay = _match_parse(planes, lengths, seg=1024, min_match=6, mm=1024,
                       detect_k=4, interpret=True, offsets=None,
                       detect_fft=True)
    tot = np.asarray(lay["total"])
    for ow in (1024, 2048):
        a = np.asarray(materialize(planes, lay, out_width=ow))
        b = np.asarray(materialize_pallas_packed(
            planes, lay, out_width=ow, interpret=True))
        for i in range(len(blocks)):
            t = int(tot[i])
            if t > ow or t >= int(np.asarray(lengths)[i]):
                continue                      # garbage-row contract
            assert (a[i, :t] == b[i, :t]).all(), f"ow={ow} blk {i}"


def test_snappy_device_offload(rng):
    # fmt="snappy": the same detect+match+parse pipeline emits standard
    # snappy framing (preamble varint + literal/copy-2 elements),
    # decodable by the native snappy codec.
    L = 16384
    base = rng.integers(32, 127, 517, np.uint8)
    blocks = np.stack([
        _plane((b"snappy device " * (L // 14 + 1))[:L], L),
        _plane(bytes([3]) * L, L),
        _plane(np.tile(base, L // 517 + 1)[:L].tobytes(), L),
    ])
    out, sizes = compress_blocks_device(
        blocks, np.asarray([L, L, L - 200], np.int32), seg=1024,
        min_match=6, out_width=4096, interpret=True, fmt="snappy",
        detect_fft=True)
    out, sizes = np.asarray(out), np.asarray(sizes)
    lens = [L, L, L - 200]
    for i, ln in enumerate(lens):
        assert sizes[i] < ln and sizes[i] <= 4096, f"blk {i} should fit"
        dec = np.asarray(native.snappy_decompress(out[i, :sizes[i]], ln))
        assert dec.tobytes() == blocks[i, :ln].tobytes(), f"blk {i}"


def test_engine_snappy_device_matcher(rng):
    import bitar_tpu as bt

    bs = 16384
    data = ((b"engine snappy offload " * (bs // 22 + 1))[:bs]
            + rng.integers(0, 256, bs, np.uint8).tobytes())
    cfg = bt.EngineConfig(
        codec=bt.Codec.SNAPPY, block_size=bs, burst_size=8,
        max_pool_slots=64, use_tpu_kernels=True, interpret=True,
        compress_matcher="device")
    with bt.Engine(cfg) as eng:
        unit = eng.compress(data)
        assert unit.manifest.ratio() > 1.5
        assert eng.decompress(unit).tobytes() == data
        eng.recycle(unit)
