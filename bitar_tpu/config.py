"""Engine configuration and capability validation.

TPU-native analog of the reference config layer (``src/include/config.h`` +
``src/config.cc``): one frozen dataclass of tuning knobs per *device class*,
validated against live device capabilities at engine initialization
(reference ``Configuration`` ``config.h:64-153``, ``ValidateConfiguration``
``device.cc:353-415``).

Knob mapping (reference -> here):

* ``burst_size``            -> ``burst_size``    (blocks per pipelined device step)
* ``decompressed_seg_size`` -> ``block_size``    (bytes of raw data per block)
* ``compressed_seg_size``   -> ``slot_size``     (derived; HBM arena slot bytes)
* ``max_sgl_segs``          -> gone: TPU blocks are flat HBM ranges, scatter-
                               gather chaining has no analog
* ``window_size``/``huffman_enc``/``checksum_type`` -> ``window_log``,
  ``level``, ``checksum`` (codec-level knobs)
* ``max_preallocate_memzones`` -> ``max_pool_slots`` (arena budget)

The compressed-slot sizing rule keeps the reference's worst-case math
(``config.cc:60-73``): slot = next power of two >= 2*block when that still
fits the class's slot ceiling, else ``ceil(1.1 * block)`` head-room for
incompressible data — additionally clamped up to the codec's true compress
bound so a slot can always hold a maximally-expanded block.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from dataclasses import dataclass, field

from .status import Status


class Codec(enum.Enum):
    """Block codecs the engine speaks.

    The reference hardware path implements DEFLATE only
    (``RTE_COMP_ALGO_DEFLATE``, reference ``config.cc:87,96``); this engine
    generalizes to the block-level codec menu required of the TPU build.
    """

    LZ4 = "lz4"          # LZ4 block format (raw, no frame)
    SNAPPY = "snappy"    # Snappy raw format
    ZSTD = "zstd"        # Zstandard frame
    RAW = "raw"          # stored/passthrough (incompressible fallback)


class Checksum(enum.Enum):
    """Optional integrity checksum recorded in the block manifest.

    Mirrors the reference's NONE/CRC32/ADLER32 menu
    (``config.h:169-177``).
    """

    NONE = "none"
    CRC32 = "crc32"
    ADLER32 = "adler32"


def next_power_of_two(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def lz4_compress_bound(n: int) -> int:
    """Worst-case LZ4 block output for n input bytes (spec formula)."""
    return n + n // 255 + 16


def snappy_compress_bound(n: int) -> int:
    """Worst-case Snappy output (format max expansion)."""
    return 32 + n + n // 6


def zstd_compress_bound(n: int) -> int:
    """Worst-case Zstandard frame size (ZSTD_compressBound formula)."""
    margin = (n >> 8) + (64 if n < (128 << 10) else 0)
    return n + margin + 12 + 8  # + frame header/footer head-room


_COMPRESS_BOUNDS = {
    Codec.LZ4: lz4_compress_bound,
    Codec.SNAPPY: snappy_compress_bound,
    Codec.ZSTD: zstd_compress_bound,
    Codec.RAW: lambda n: n + 8,
}


def compress_bound(codec: Codec, n: int) -> int:
    return _COMPRESS_BOUNDS[codec](n)


@dataclass(frozen=True, slots=True)
class DeviceCapabilities:
    """What a device class can do; checked at Engine.initialize.

    The analog of the queried ``rte_compressdev_info`` capability record the
    reference validates against (``device.cc:353-415``).
    """

    name: str
    codecs: tuple[Codec, ...]
    min_block_size: int          # reference kMinSegSize analog (config.h:41-48)
    max_block_size: int
    max_burst_size: int
    max_inflight_bursts: int     # reference kMaxInflightOps=512 analog (memory.h:50)
    vmem_budget_bytes: int       # per-core VMEM available to codec kernels
    hbm_budget_bytes: int        # arena ceiling
    supports_async: bool = True


TPU_V5E = DeviceCapabilities(
    name="tpu-v5e",
    codecs=(Codec.LZ4, Codec.SNAPPY, Codec.ZSTD, Codec.RAW),
    min_block_size=1 << 10,
    max_block_size=1 << 20,
    max_burst_size=2048,
    max_inflight_bursts=512,
    # v5e carries 128 MiB of VMEM per chip (public spec; see
    # jax-ml.github.io/scaling-book "TPU architecture" table).  Budget 96
    # MiB for codec kernels, leaving head-room for XLA's own scratch.
    vmem_budget_bytes=96 * 1024 * 1024,
    hbm_budget_bytes=12 << 30,
    supports_async=True,
)

TPU_V4 = dataclasses.replace(TPU_V5E, name="tpu-v4", hbm_budget_bytes=24 << 30)

CPU_INTERPRET = DeviceCapabilities(
    name="cpu-interpret",
    codecs=(Codec.LZ4, Codec.SNAPPY, Codec.ZSTD, Codec.RAW),
    min_block_size=64,
    max_block_size=1 << 20,
    max_burst_size=64,
    max_inflight_bursts=16,
    vmem_budget_bytes=1 << 30,
    hbm_budget_bytes=4 << 30,
    supports_async=True,
)


def capabilities_for_platform(platform: str) -> DeviceCapabilities:
    """Map a jax device platform string to a capability record.

    The analog of the reference's PCI-id -> device-class dispatch
    (``driver.cc:75-98``, ``device.h:57-63``).
    """
    platform = platform.lower()
    if platform in ("tpu", "axon"):
        return TPU_V5E
    return CPU_INTERPRET


# Default knob values; reference defaults at config.h:146-152 (burst 32,
# seg 2048).  The TPU operating point uses larger blocks — the headline
# benchmark config is 128 KiB blocks (BASELINE.json).
DEFAULT_BURST_SIZE = 32
DEFAULT_BLOCK_SIZE = 128 * 1024
MIN_POOL_SLOTS = 20              # reference kMinPreallocateMemzones (memory.h:51)

# Parse segment for the full-offload (device matcher) compress path: also
# the on-device match-length cap.  512 keeps RLE ratios useful while the
# parse scan stays at seg/min_match steps (see ops/device_compress.py).
DEVICE_PARSE_SEG = 1024


def device_matcher_slots(block_size: int, min_match: int,
                         seg: int = DEVICE_PARSE_SEG, wcap: int = 8) -> int:
    """Sequence-slot count of the device-offload emission layout.

    ``materialize`` packs the slot index into a 15-bit scan key, so
    nseg*nstep + 1 must stay < 2**15; validated at config time so a
    validated config can never hit the packing limit at compress time.
    The detector-driven parse caps sequences per segment at ``wcap``
    (overflowing blocks store RAW), so nstep = min(wcap, worst case)."""
    seg = min(seg, block_size)
    nseg = -(-block_size // seg)
    nstep = min(wcap, seg // min_match + 1)
    return nseg * nstep + 1


@dataclass(frozen=True, slots=True)
class EngineConfig:
    """Tuning knobs for one engine instance (one device).

    Frozen after validation, exactly like the reference configuration that
    is copied into the device at ``Initialize`` (``device.cc:115-154``).
    """

    codec: Codec = Codec.LZ4
    block_size: int = DEFAULT_BLOCK_SIZE
    burst_size: int = DEFAULT_BURST_SIZE
    level: int = 1                      # codec effort (zstd level; lz4/snappy ignore)
    min_match: int = 6                  # smallest LZ4/Snappy match emitted.
                                        # 4 = max ratio; the default 6 drops only
                                        # marginal hash-collision matches (measured:
                                        # text ratio +3%, barely-compressible blocks
                                        # go literal-only and decode in ~1 pass
                                        # instead of ~43).  Applies to the host
                                        # matcher AND the TPU-matcher emitters.
    window_log: int = 16                # match window log2; LZ4 format caps at 16
    checksum: Checksum = Checksum.NONE
    max_pool_slots: int = 4096          # arena slot budget (memzone budget analog)
    pipeline_depth: int = 2             # double-buffered HBM->VMEM staging depth
    dense_q: int = 4                    # dense decode passes batched per stacked
                                        # gather (anchors concatenate along the
                                        # matmul M dim; passes are independent —
                                        # all read the constant comp plane).
                                        # 1 = unbatched; per-pass fixed costs
                                        # dominate text decode, so >1 amortizes
    dense_sub: int = 128                # dense-pass M-subtile rows: each
                                        # subtile loops only its OWN max
                                        # window count (row window counts are
                                        # skewed; see lz4_decode_flat._DENSE_SUB)
    use_tpu_kernels: bool = True        # False -> host (native C++) codec path
    interpret: bool = False             # run Pallas kernels in interpreter mode
    compress_matcher: str = "host"      # "host" (hash matcher, quality),
                                        # "tpu" (Pallas candidate-offset
                                        # matcher), "tpu-sort"
                                        # (device value-sort, exact greedy
                                        # at any offset), or "device"
                                        # (FULL offload: match + parse +
                                        # emission on device, compressed
                                        # bytes land in arena slots
                                        # device-side); tpu*/device need
                                        # LZ4 (+Snappy for tpu*) and
                                        # 16KiB-aligned blocks
    match_offsets: tuple[int, ...] = () # () -> kernel default candidate set
    detect_fft: bool | str = False      # device matcher: add FFT-autocorr
                                        # period candidates (finds periods
                                        # the 64-byte sampled grid cannot
                                        # see, e.g. text tiled at a
                                        # non-64-multiple).  True = per
                                        # block (~0.1 ms/128 KiB);
                                        # "sample" = rfft on 8
                                        # representative blocks, lags
                                        # broadcast (~1/32 the cost; for
                                        # homogeneous corpora)
    fft_k: int = 6                      # autocorr peaks kept per FFT pass
                                        # (markdown sweep 2026-08-20:
                                        # k=2 ratio 3.305, k=6 3.356 at
                                        # equal device time; candidates
                                        # saturate past ~6)
    commit: str = "eager"               # when compressed bytes reach the
                                        # device arena: "eager" (during
                                        # compress, pipelined with the
                                        # matcher) or "deferred" (at first
                                        # device decode / explicit commit).
                                        # Deferred is the reference
                                        # contract — Compress ends when
                                        # output sits in POOL memory
                                        # (device.cc:157-238); the DPU
                                        # DMAs host memzones on demand.
    plan_build: str = "background"      # when the decode plan (the flat
                                        # kernel wire) is built for
                                        # engine-compressed units:
                                        # "background" starts it on a
                                        # worker thread DURING compress
                                        # (the compressor just produced
                                        # the sequences; the reference
                                        # assembles decode ops in us on
                                        # the hot path, memory.cc:351-430
                                        # — ensure_plans becomes a join),
                                        # "lazy" defers it to the first
                                        # decompress (pre-r5 behavior).

    # ------------------------------------------------------------------
    @property
    def slot_size(self) -> int:
        """Bytes per compressed-output arena slot (derived).

        Keeps the reference sizing rule (``config.cc:60-73``): prefer the
        next power of two >= 2*block; if that exceeds 4x the block (i.e. the
        rule would waste memory) fall back to 1.1x head-room.  Always at
        least the codec's true compress bound, rounded up to 128 bytes so
        slots are TPU-lane aligned.
        """
        pow2 = next_power_of_two(2 * self.block_size)
        candidate = pow2 if pow2 <= 4 * self.block_size else math.ceil(1.1 * self.block_size)
        bound = compress_bound(self.codec, self.block_size)
        return _round_up(max(candidate, bound), 128)

    def validate(self, caps: DeviceCapabilities) -> Status:
        """Validate knobs against device capabilities.

        Mirrors ``ValidateConfiguration`` (reference ``device.cc:353-415``):
        codec support, block-size bounds, burst bounds, pool budget floor,
        and window-size range.
        """
        if self.codec not in caps.codecs:
            return Status.Invalid(
                f"codec {self.codec.value} unsupported by device class {caps.name}")
        if not (caps.min_block_size <= self.block_size <= caps.max_block_size):
            return Status.Invalid(
                f"block_size {self.block_size} outside device range "
                f"[{caps.min_block_size}, {caps.max_block_size}]")
        if not (1 <= self.burst_size <= caps.max_burst_size):
            return Status.Invalid(
                f"burst_size {self.burst_size} outside [1, {caps.max_burst_size}]")
        if self.pipeline_depth < 1 or self.pipeline_depth > caps.max_inflight_bursts:
            return Status.Invalid(
                f"pipeline_depth {self.pipeline_depth} outside "
                f"[1, {caps.max_inflight_bursts}]")
        if not (1 <= self.dense_q <= 8):
            return Status.Invalid(
                f"dense_q {self.dense_q} outside [1, 8] (VMEM transients "
                f"scale with dense_q * mt_max rows)")
        if self.dense_sub % 128 or self.dense_sub < 128:
            return Status.Invalid(
                f"dense_sub {self.dense_sub} must be a positive multiple "
                f"of 128 (lane-tiled subtile rows)")
        if self.max_pool_slots < MIN_POOL_SLOTS:
            return Status.Invalid(
                f"max_pool_slots {self.max_pool_slots} < minimum {MIN_POOL_SLOTS} "
                f"(reference kMinPreallocateMemzones)")
        if self.max_pool_slots * self.slot_size > caps.hbm_budget_bytes:
            return Status.CapacityError(
                f"arena budget {self.max_pool_slots * self.slot_size} exceeds HBM "
                f"budget {caps.hbm_budget_bytes}")
        if self.codec == Codec.LZ4 and self.window_log > 16:
            return Status.Invalid("LZ4 window_log caps at 16 (64 KiB format window)")
        if not (8 <= self.window_log <= 27):
            return Status.Invalid(f"window_log {self.window_log} outside [8, 27]")
        if self.level < 0 or self.level > 22:
            return Status.Invalid(f"level {self.level} outside [0, 22]")
        if not (4 <= self.min_match <= 512):
            return Status.Invalid(f"min_match {self.min_match} outside [4, 512]")
        if self.compress_matcher not in ("host", "tpu", "tpu-sort", "device"):
            return Status.Invalid(
                f"compress_matcher {self.compress_matcher!r} not in "
                f"(host, tpu, tpu-sort, device)")
        if self.detect_fft not in (False, True, "sample"):
            return Status.Invalid(
                f"detect_fft {self.detect_fft!r} not in "
                f"(False, True, 'sample')")
        if not (1 <= self.fft_k <= 16):
            return Status.Invalid(f"fft_k {self.fft_k} outside [1, 16]")
        if self.compress_matcher in ("tpu", "tpu-sort", "device"):
            if self.codec not in (Codec.LZ4, Codec.SNAPPY):
                return Status.Invalid(
                    "tpu/device matchers support LZ4 and Snappy")
            if self.block_size % (128 * 128) != 0:
                return Status.Invalid(
                    "tpu matcher needs block_size % 16384 == 0 (lane-tiled rows)")
            bad_off = [d for d in self.match_offsets
                       if not (1 <= d <= 0xFFFF)]
            if bad_off:
                return Status.Invalid(
                    f"match_offsets {bad_off[:4]} outside [1, 65535] "
                    f"(LZ4/Snappy 16-bit distance; device emission packs "
                    f"offsets in 16 bits)")
        if self.compress_matcher == "device":
            slots = device_matcher_slots(self.block_size, self.min_match)
            if slots >= (1 << 15):
                return Status.Invalid(
                    f"device matcher layout needs {slots} sequence slots "
                    f">= 2^15 (block_size {self.block_size} / min_match "
                    f"{self.min_match}); raise min_match or shrink blocks")
        if self.commit not in ("eager", "deferred"):
            return Status.Invalid(
                f"commit {self.commit!r} not in (eager, deferred)")
        if self.plan_build not in ("background", "lazy"):
            return Status.Invalid(
                f"plan_build {self.plan_build!r} not in (background, lazy)")
        return Status.OK()

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclass(frozen=True, slots=True)
class ShardingConfig:
    """Multi-chip / multi-host layout knobs (no reference analog: the
    reference is single-process, its only topology being the queue-pair ->
    lcore round-robin map, ``driver.cc:100-158``)."""

    data_axis: str = "blocks"
    mesh_shape: tuple[int, ...] = field(default_factory=tuple)  # () -> all devices, 1D
    skew_bucket_log: int = 2      # blocks binned by ceil(log2(size)) / this for shuffle balance
