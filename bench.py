"""Driver benchmark: one JSON line with the headline metric.

Measures LZ4 block decompress AND compress on one chip (128 KiB blocks,
mixed-entropy corpus: text / low-entropy / random / RLE in equal parts),
with a full engine-level bit-exact round-trip as the correctness gate
(the reference demo app's memcmp oracle, ``demo_app.cc:534-543``).

Decompress runs the flat-plan int8 Pallas kernel
(``ops/pallas/lz4_decode_flat.py``).  Timing structure matches the
measured physics of this dev environment (ARCHITECTURE.md "Measurement
physics"): launches pipeline behind one another with a single ~26 ms
round-trip cost per *sync*, so the timed phase chains REPS whole-batch
decode launches on device-committed inputs and syncs once with a tiny
readback — per-launch time is the sustained decode rate, the reference's
own steady-state measurement shape (3-run averages, ``demo_app.h:45``).
Decoded planes stay device-resident, matching the reference contract
(output lands in device memzones; ``Decompress`` aliases them).

Compress is the host engine (native C++ matcher) staged to device; its
wall time includes block split, matching, plan build, and arena upload.

The LAST stdout line is the JSON record; ``value`` is decompress GB/s
(the BASELINE.json north star is 10 GB/s decompress), with compress and
combined throughput reported alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persist Mosaic compiles across bench runs (20-100s per kernel shape on
# the remote compiler otherwise).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

NORTH_STAR_GBPS = 10.0
BLOCK = 128 * 1024
# Large launches amortize the fixed per-launch dispatch cost.  Measured
# on silicon (2026-08-18, scratch/r3_bench_*.log): 256 blocks -> 8.82
# GB/s, 512 -> 14.94, 1024 -> 19.13, 2048 -> 21.09.  1024 is the
# operating point: past it the marginal per-block cost (~5 us) is
# compute-bound, and the corpus size starts to dominate bench wall
# time.  The reference's analog is burst sizing (config.h:146-152).
NBLOCKS = int(os.environ.get("BENCH_NBLOCKS", "1024"))
REPS = int(os.environ.get("BENCH_REPS", "8"))


def make_corpus(nblocks: int) -> bytes:
    rng = np.random.default_rng(2026)
    parts = []
    for i in range(nblocks):
        k = i % 4
        if k == 0:
            p = (b"The quick brown fox jumps over the lazy dog %d. " % i) * (BLOCK // 47 + 1)
        elif k == 1:
            p = rng.integers(0, 16, BLOCK, dtype=np.uint8).tobytes()
        elif k == 2:
            p = rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes()
        else:
            p = bytes([i & 0xFF]) * BLOCK
        parts.append(p[:BLOCK])
    return b"".join(parts)


def make_text_corpus(nblocks: int) -> bytes:
    """Adversarial secondary corpus: real markdown-like text (the decode
    kernel's HARDEST class — many short matches, deep out-pass schedules,
    no RAW/RLE escape hatches).  SURVEY.md tiled with per-block mutation
    so blocks don't dedupe to identical plans."""
    base = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "SURVEY.md"), "rb").read()
    reps = -(-(nblocks * BLOCK) // len(base))
    buf = bytearray((base * reps)[:nblocks * BLOCK])
    for i in range(nblocks):                 # unique tag per block
        tag = b"[[blk %06d]]" % i
        buf[i * BLOCK:i * BLOCK + len(tag)] = tag
    return bytes(buf)


def main() -> int:
    import jax

    # BENCH_PLATFORM=cpu forces a CPU (interpret-mode) smoke run even on
    # hosts whose sitecustomize pins JAX_PLATFORMS to the accelerator.
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # Device watchdog: a wedged tunnel hangs even jax.devices(); probe on
    # daemon threads and emit an explicit failure record instead of
    # hanging the driver forever (observed: 4+ h tunnel outages).
    # RETRY on backoff within the window: a wedge that clears mid-window
    # (tunnel reconnects) no longer zeroes the round — each attempt
    # issues a FRESH readback, which succeeds after recovery even while
    # earlier attempts stay blocked.
    import threading
    probe_ok = threading.Event()

    def _probe(k: int):
        # Identical program every attempt (k stays a runtime array
        # argument): retries issue a fresh RPC, not a fresh compile — a
        # per-attempt HLO constant would queue minutes of tunnel compiles.
        import numpy as _np
        import jax as _jax
        import jax.numpy as _jnp
        _np.asarray(_jax.jit(lambda v: v.sum())(
            _jnp.full((8, 128), float(k))))
        probe_ok.set()

    deadline = time.monotonic() + float(os.environ.get(
        "BENCH_PROBE_TIMEOUT_S", "600"))
    attempt = 0
    while not probe_ok.is_set() and time.monotonic() < deadline:
        threading.Thread(target=_probe, args=(attempt,), daemon=True).start()
        if attempt:
            print(f"bench: device probe retry {attempt}", file=sys.stderr)
        probe_ok.wait(timeout=min(90.0, max(1.0,
                                            deadline - time.monotonic())))
        attempt += 1
    if not probe_ok.is_set():
        print(json.dumps({
            "metric": "lz4_decompress_GBps_per_chip_128KiB_blocks",
            "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0,
            "error": "device unreachable: trivial readback timed out "
                     f"({attempt} probe attempts over the watchdog "
                     "window; wedged tunnel); no measurement possible",
        }))
        sys.stdout.flush()
        os._exit(3)

    import bitar_tpu as bt
    from bitar_tpu.utils.profiling import annotate, device_trace

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    data = make_corpus(NBLOCKS)

    # commit="deferred" is the reference contract (Compress ends when
    # output reaches POOL memory, device.cc:157-238; the accelerator DMAs
    # host buffers on demand): the compress phase measures the codec
    # work, and the arena upload lands in plan_build/decode prep where
    # the decode-side DMA belongs.
    cfg = bt.EngineConfig(
        codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=NBLOCKS,
        max_pool_slots=max(64, NBLOCKS + 32), commit="deferred",
        use_tpu_kernels=on_tpu, interpret=not on_tpu)
    eng = bt.Engine(cfg).initialize()
    print(f"bench: backend={backend} device={eng.device} "
          f"bytes={len(data):,}", file=sys.stderr)

    # --- compress phase (host matcher + device staging), best of 3 like
    # the reference's kNumTests.  commit="deferred" is the headline
    # (reference contract); one eager-commit run is also reported so
    # cross-round comparisons stay honest (the upload cost is visible).
    comp_best = float("inf")
    unit = None
    for run in range(3):
        if unit is not None:
            eng.recycle(unit)
        with annotate("bench.compress"):
            t0 = time.perf_counter()
            unit = eng.compress(data)
            dt = time.perf_counter() - t0
        comp_best = min(comp_best, dt)
        print(f"bench: compress run {run}: {dt * 1e3:.1f} ms "
              f"({len(data) / dt / 1e9:.3f} GB/s)", file=sys.stderr)

    # Deferred-commit upload, timed separately: ensure_plans commits
    # the unit's compressed bytes to the arena first, and through the
    # dev tunnel that h2d (~64 MB at the h2d_GBps below) dwarfs the
    # build — fold it into plan_build_ms and the number measures the
    # link, not the planner.
    t0 = time.perf_counter()
    eng._ensure_committed(unit)
    commit_ms = (time.perf_counter() - t0) * 1e3
    # Plan join: with plan_build="background" the flat wire was built on
    # the plan worker DURING/after compress (plan-during-emission) on
    # init-prefaulted pool pages; this times what's left at first use —
    # the reference's µs-scale op assembly analog (memory.cc:351-430).
    t0 = time.perf_counter()
    eng.ensure_plans(unit)
    plan_ms = (time.perf_counter() - t0) * 1e3
    print(f"bench: commit upload {commit_ms:.1f} ms; plan join "
          f"{plan_ms:.1f} ms (background build)", file=sys.stderr)
    pf = unit.plan_flat
    dn = pf["dense"] if pf is not None else None
    print(f"bench: ratio={unit.manifest.ratio():.3f} blocks={unit.nblocks} "
          f"planned={pf is not None} "
          f"passes={int(pf['p_used'].sum()) if pf is not None else -1} "
          f"dense={int(np.maximum(dn, 0).sum()) if dn is not None else -1} "
          f"identity={int((dn < 0).sum()) if dn is not None else -1} "
          f"plan_build={plan_ms:.1f}ms",
          file=sys.stderr)

    # Correctness gate: full engine round-trip, byte-exact.
    out = eng.decompress(unit)
    assert out.tobytes() == data, "round-trip not bit-exact"
    print("bench: engine round-trip verified bit-exact", file=sys.stderr)

    # --- eager-commit compress (ADVICE r3: keep eager and deferred both
    # in the record; the two differ by the arena-upload placement).
    comp_eager = None
    try:
        eeng = bt.Engine(cfg.replace(commit="eager")).initialize()
        best = float("inf")
        eunit = None
        for _ in range(2):
            if eunit is not None:
                eeng.recycle(eunit)
            t0 = time.perf_counter()
            eunit = eeng.compress(data)
            best = min(best, time.perf_counter() - t0)
        comp_eager = len(data) / best / 1e9
        print(f"bench: eager-commit compress {best * 1e3:.1f} ms "
              f"({comp_eager:.3f} GB/s)", file=sys.stderr)
        eeng.recycle(eunit)
        eeng.release()
    except Exception as e:                             # secondary metric only
        print(f"bench: eager compress skipped: {e}", file=sys.stderr)

    # --- decompress phase: REPS chained whole-batch kernel launches on
    # device-committed inputs, one tiny readback sync (launches pipeline;
    # see module docstring).
    comp_rows = unit.plan_comp_rows
    launch = eng.prepare_device_decode(unit)

    o = launch()
    np.asarray(o[0, 0, :1])                      # warm-up / compile
    host = np.asarray(o)
    assert host.reshape(NBLOCKS, -1)[:, :BLOCK].reshape(-1).tobytes() == data, \
        "timed-path output mismatch"

    # BITAR_TPU_TRACE_DIR=<dir> captures a jax.profiler device trace of
    # the timed phase (no-op otherwise).
    dec_best = float("inf")
    with device_trace():
        for run in range(3):
            with annotate("bench.decompress"):
                t0 = time.perf_counter()
                last = None
                for _ in range(REPS):
                    last = launch()
                np.asarray(last[0, 0, :1])       # sync (readback forces it)
                dt = (time.perf_counter() - t0) / REPS
            dec_best = min(dec_best, dt)
            print(f"bench: decompress run {run}: {dt * 1e3:.2f} ms/launch "
                  f"({len(data) / dt / 1e9:.3f} GB/s)", file=sys.stderr)

    eng.recycle(unit)
    eng.release()

    # --- COLD one-shot decompress: fresh DATA through a fresh engine,
    # warm PROGRAM (the decode kernel compiled above — the reference's
    # program is installed once; its cold path is cold data).  Timing
    # spans ensure_plans (background-plan join + deferred-commit upload),
    # decode staging, launch, and the sync.  The h2d probe attributes
    # the upload share: on the dev tunnel host->device runs ~0.2 GB/s,
    # so the compressed bytes' crossing bounds cold decode; on attached
    # hardware the same path rides PCIe/DMA at tens of GB/s.
    cold_gbps = plan_cold_ms = h2d_gbps = None
    try:
        probe = np.random.default_rng(7).integers(
            0, 256, 64 * 1024 * 1024, dtype=np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(probe)
        d.block_until_ready()
        h2d_gbps = probe.nbytes / (time.perf_counter() - t0) / 1e9
        del d
        print(f"bench: h2d bandwidth {h2d_gbps:.3f} GB/s (64 MiB probe)",
              file=sys.stderr)
        cdata = make_corpus(NBLOCKS + 1)[BLOCK:]      # fresh bytes
        ceng = bt.Engine(cfg).initialize()
        cunit = ceng.compress(cdata)                   # bg plans start here
        t0 = time.perf_counter()
        ceng.ensure_plans(cunit)
        plan_cold_ms = (time.perf_counter() - t0) * 1e3
        claunch = ceng.prepare_device_decode(cunit)
        oc = claunch()
        np.asarray(oc[0, 0, :1])
        cold_dt = time.perf_counter() - t0
        cold_gbps = len(cdata) / cold_dt / 1e9
        print(f"bench: COLD decompress {cold_dt * 1e3:.1f} ms "
              f"({cold_gbps:.3f} GB/s; plan_join={plan_cold_ms:.1f}ms, "
              f"fresh data, warm program)", file=sys.stderr)
        ceng.recycle(cunit)
        ceng.release()
    except Exception as e:                             # secondary metric only
        print(f"bench: cold phase skipped: {e}", file=sys.stderr)

    # --- secondary: zstd through the same device decode path (sequence
    # execution on the kernel, literals from the host-entropy-decoded
    # plane; ops/cpu/zstd.cc).  Same plane shape as the LZ4 phase, so the
    # kernel compile is shared.
    zstd_dec = zstd_comp = None
    try:
        zcfg = cfg.replace(codec=bt.Codec.ZSTD, level=3)
        zeng = bt.Engine(zcfg).initialize()
        t0 = time.perf_counter()
        zunit = zeng.compress(data)
        zstd_comp = len(data) / (time.perf_counter() - t0) / 1e9
        zeng.ensure_plans(zunit)
        if zunit.plan_flat is not None and zunit.plan_comp_rows == comp_rows:
            zout = zeng.decompress(zunit)
            assert zout.tobytes() == data, "zstd round-trip not bit-exact"
            zlaunch = zeng.prepare_device_decode(zunit)
            np.asarray(zlaunch()[0, 0, :1])            # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                last = None
                for _ in range(REPS):
                    last = zlaunch()
                np.asarray(last[0, 0, :1])
                best = min(best, (time.perf_counter() - t0) / REPS)
            zstd_dec = len(data) / best / 1e9
            print(f"bench: zstd decompress {best*1e3:.2f} ms/launch "
                  f"({zstd_dec:.3f} GB/s, device path)", file=sys.stderr)
        zeng.recycle(zunit)
        zeng.release()
    except Exception as e:                             # secondary metric only
        print(f"bench: zstd phase skipped: {e}", file=sys.stderr)

    # --- secondary: snappy through the same device decode path (the
    # third operator of the BASELINE set; plannable per ops/cpu/plan.cc
    # bt_snappy_parse).  Same plane shape as the LZ4 phase, so the
    # kernel compile is shared.
    snappy_dec = snappy_comp = None
    try:
        scfg = cfg.replace(codec=bt.Codec.SNAPPY)
        seng = bt.Engine(scfg).initialize()
        t0 = time.perf_counter()
        sunit = seng.compress(data)
        snappy_comp = len(data) / (time.perf_counter() - t0) / 1e9
        seng.ensure_plans(sunit)
        if sunit.plan_flat is not None and sunit.plan_comp_rows == comp_rows:
            sout = seng.decompress(sunit)
            assert sout.tobytes() == data, "snappy round-trip not bit-exact"
            slaunch = seng.prepare_device_decode(sunit)
            np.asarray(slaunch()[0, 0, :1])            # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                last = None
                for _ in range(REPS):
                    last = slaunch()
                np.asarray(last[0, 0, :1])
                best = min(best, (time.perf_counter() - t0) / REPS)
            snappy_dec = len(data) / best / 1e9
            print(f"bench: snappy decompress {best*1e3:.2f} ms/launch "
                  f"({snappy_dec:.3f} GB/s, device path)", file=sys.stderr)
        seng.recycle(sunit)
        seng.release()
    except Exception as e:                             # secondary metric only
        print(f"bench: snappy phase skipped: {e}", file=sys.stderr)

    # --- secondary: real-text corpus (markdown), the decode kernel's
    # hardest class — no RAW/RLE escape hatches, deep out-pass
    # schedules.  Keeps the headline honest about unfriendly data.
    text_dec = None
    try:
        tdata = make_text_corpus(NBLOCKS)
        teng = bt.Engine(cfg).initialize()
        tunit = teng.compress(tdata)
        teng.ensure_plans(tunit)
        tout = teng.decompress(tunit)
        assert tout.tobytes() == tdata, "text round-trip not bit-exact"
        tlaunch = teng.prepare_device_decode(tunit)
        np.asarray(tlaunch()[0, 0, :1])                # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(REPS):
                last = tlaunch()
            np.asarray(last[0, 0, :1])
            best = min(best, (time.perf_counter() - t0) / REPS)
        text_dec = len(tdata) / best / 1e9
        tpf = tunit.plan_flat
        print(f"bench: text decompress {best*1e3:.2f} ms/launch "
              f"({text_dec:.3f} GB/s, ratio "
              f"{tunit.manifest.ratio():.3f}, passes "
              f"{int(tpf['p_used'].sum())}, dense "
              f"{int(np.maximum(tpf['dense'], 0).sum())})", file=sys.stderr)
        teng.recycle(tunit)
        teng.release()
    except Exception as e:                             # secondary metric only
        print(f"bench: text phase skipped: {e}", file=sys.stderr)

    # --- secondary: FULL-OFFLOAD device compression — detect + match +
    # parse + emit fused into ONE dispatch per launch
    # (ops/device_compress.py), measured like decode: device-resident
    # planes, chained launches, tiny sync.  256-block launches amortize
    # the ~3-4 ms tunnel dispatch floor; seg=1024 + OW=2048 is the
    # measured operating point (r4: 28.3 ms / 33.5 MB = 1.19 GB/s).
    dev_comp = dev_ratio = dev_comp32 = dev_text_ratio = None
    dev_snappy = dev_text_gbps = None
    if on_tpu:
        try:
            from bitar_tpu.ops.device_compress import compress_blocks_device
            nd = min(256, NBLOCKS)
            dseg, dow = 1024, 2048
            planes = np.frombuffer(data[:nd * BLOCK], np.uint8).reshape(
                nd, BLOCK)
            dplanes = jax.device_put(planes)
            dlen = jax.device_put(np.full(nd, BLOCK, np.int32))
            np.asarray(dplanes[0, :1])
            out, sizes = compress_blocks_device(dplanes, dlen, seg=dseg,
                                                min_match=6, out_width=dow)
            szs = np.asarray(sizes)
            host = np.asarray(out)
            import bitar_tpu.ops.cpu.native as _native
            comp_total = 0
            for i in range(nd):                     # correctness gate
                if szs[i] >= BLOCK or szs[i] > dow:  # RAW-fallback contract
                    comp_total += BLOCK
                    continue
                dec = np.asarray(_native.lz4_decompress(host[i, :szs[i]], BLOCK))
                assert dec.tobytes() == planes[i].tobytes(), f"devcomp blk {i}"
                comp_total += int(szs[i])
            dev_ratio = nd * BLOCK / comp_total
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                last = None
                for _ in range(REPS):
                    last = compress_blocks_device(
                        dplanes, dlen, seg=dseg, min_match=6, out_width=dow)
                np.asarray(last[0].reshape(-1)[:1])
                np.asarray(last[1][:1])
                best = min(best, (time.perf_counter() - t0) / REPS)
            dev_comp = nd * BLOCK / best / 1e9
            print(f"bench: device-offload compress {best*1e3:.2f} ms/launch "
                  f"({dev_comp:.3f} GB/s, {nd} blocks, ratio "
                  f"{dev_ratio:.3f}, fused detect+match+parse+emit)",
                  file=sys.stderr)
            # Launch-amortized arm: the dev tunnel charges a ~24 ms
            # dispatch-sync RTT per timing cycle (measured 2026-08-20),
            # i.e. ~3 ms/launch at REPS=8 — 25-35% of a ~9 ms launch.
            # 32 queued launches cut that to <1 ms/launch; steady-state
            # pipelines run at this depth, so report it alongside the
            # REPS-comparable number rather than replacing it.
            best32 = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                last = None
                for _ in range(32):
                    last = compress_blocks_device(
                        dplanes, dlen, seg=dseg, min_match=6, out_width=dow)
                np.asarray(last[0].reshape(-1)[:1])
                np.asarray(last[1][:1])
                best32 = min(best32, (time.perf_counter() - t0) / 32)
            dev_comp32 = nd * BLOCK / best32 / 1e9
            print(f"bench: device-offload compress depth-32 "
                  f"{best32*1e3:.2f} ms/launch ({dev_comp32:.3f} GB/s)",
                  file=sys.stderr)
            # Snappy through the same offload pipeline (8 K wire: the
            # 64-byte copy cap expands periodic blocks ~6x vs LZ4).
            sout, ssizes = compress_blocks_device(
                dplanes, dlen, seg=dseg, min_match=6, out_width=8192,
                fmt="snappy")
            ssz = np.asarray(ssizes)
            shost = np.asarray(sout)
            sttot = 0
            for i in range(nd):
                if ssz[i] >= BLOCK or ssz[i] > 8192:
                    sttot += BLOCK
                    continue
                dec = np.asarray(_native.snappy_decompress(
                    shost[i, :ssz[i]], BLOCK))
                assert dec.tobytes() == planes[i].tobytes(), \
                    f"devcomp snappy blk {i}"
                sttot += int(ssz[i])
            bests = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                last = None
                for _ in range(32):
                    last = compress_blocks_device(
                        dplanes, dlen, seg=dseg, min_match=6,
                        out_width=8192, fmt="snappy")
                np.asarray(last[0].reshape(-1)[:1])
                bests = min(bests, (time.perf_counter() - t0) / 32)
            dev_snappy = nd * BLOCK / bests / 1e9
            print(f"bench: device-offload SNAPPY {bests*1e3:.2f} ms/launch "
                  f"({dev_snappy:.3f} GB/s depth-32, ratio "
                  f"{nd * BLOCK / sttot:.3f})", file=sys.stderr)
            # Device-path ratio on the markdown corpus: real text needs
            # the FFT period detector (the sampled grid cannot see the
            # corpus' non-64-multiple tiling period) and a wire wide
            # enough for the per-block literal head (no history exists
            # before one period), chunked so the broadcast-lane
            # emission plane stays bounded.
            tow, tchunk = 49152, 64
            tplanes = np.frombuffer(
                make_text_corpus(nd)[:nd * BLOCK], np.uint8).reshape(
                    nd, BLOCK)
            tdev = [jax.device_put(tplanes[s:s + tchunk])
                    for s in range(0, nd, tchunk)]
            tl = jax.device_put(np.full(tchunk, BLOCK, np.int32))
            ttot = 0
            tdevn = 0
            touts = []
            # Warm pass (compiles once — every chunk shares the shape).
            np.asarray(compress_blocks_device(
                tdev[0], tl, seg=dseg, min_match=6, out_width=tow,
                detect_fft="sample", fft_k=6)[1])
            # Timed pass: device work + size readback only; byte-exact
            # verify below is host work and stays out of the clock.
            t_text0 = time.perf_counter()
            for tdp in tdev:
                tout, tsizes = compress_blocks_device(
                    tdp, tl, seg=dseg, min_match=6, out_width=tow,
                    detect_fft="sample", fft_k=6)
                touts.append((tout, np.asarray(tsizes)))
            t_text = time.perf_counter() - t_text0
            for s, (tout, tsz) in zip(range(0, nd, tchunk), touts):
                thost = np.asarray(tout)
                for i in range(tsz.shape[0]):
                    if tsz[i] >= BLOCK or tsz[i] > tow:
                        ttot += BLOCK
                        continue
                    tdevn += 1
                    dec = np.asarray(_native.lz4_decompress(
                        thost[i, :tsz[i]], BLOCK))
                    assert dec.tobytes() == tplanes[s + i].tobytes(), \
                        f"devcomp text blk {s + i}"
                    ttot += int(tsz[i])
            dev_text_ratio = nd * BLOCK / ttot
            dev_text_gbps = nd * BLOCK / t_text / 1e9
            print(f"bench: device-offload TEXT ratio {dev_text_ratio:.3f} "
                  f"({tdevn}/{nd} blocks device-compressed, "
                  f"{dev_text_gbps:.2f} GB/s warm device+size-readback; "
                  f"FFT offsets + partial parse)",
                  file=sys.stderr)
        except Exception as e:                       # secondary metric only
            print(f"bench: device-compress phase skipped: {e}", file=sys.stderr)

    dec_gbps = len(data) / dec_best / 1e9
    comp_gbps = len(data) / comp_best / 1e9
    combined = len(data) / (dec_best + comp_best) / 1e9
    print(json.dumps({
        "metric": "lz4_decompress_GBps_per_chip_128KiB_blocks",
        "value": round(dec_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(dec_gbps / NORTH_STAR_GBPS, 4),
        "compress_GBps": round(comp_gbps, 4),
        "compress_eager_GBps": round(comp_eager, 4) if comp_eager else None,
        "combined_GBps": round(combined, 4),
        "decompress_cold_GBps": round(cold_gbps, 4) if cold_gbps else None,
        "plan_build_ms": round(plan_ms, 1),
        "commit_upload_ms": round(commit_ms, 1),
        "plan_join_cold_ms": round(plan_cold_ms, 1)
        if plan_cold_ms is not None else None,
        "h2d_GBps": round(h2d_gbps, 4) if h2d_gbps else None,
        "zstd_decompress_GBps": round(zstd_dec, 4) if zstd_dec else None,
        "zstd_compress_GBps": round(zstd_comp, 4) if zstd_comp else None,
        "snappy_decompress_GBps": round(snappy_dec, 4) if snappy_dec else None,
        "snappy_compress_GBps": round(snappy_comp, 4) if snappy_comp else None,
        "text_decompress_GBps": round(text_dec, 4) if text_dec else None,
        "device_offload_compress_GBps": round(dev_comp, 4) if dev_comp else None,
        "device_offload_compress_depth32_GBps": round(dev_comp32, 4)
        if dev_comp32 else None,
        "device_offload_ratio": round(dev_ratio, 4) if dev_ratio else None,
        "device_offload_text_ratio": round(dev_text_ratio, 4)
        if dev_text_ratio else None,
        "device_offload_text_GBps": round(dev_text_gbps, 4)
        if dev_text_gbps else None,
        "device_offload_snappy_GBps": round(dev_snappy, 4)
        if dev_snappy else None,
    }))
    return 0


if __name__ == "__main__":
    rc = main()
    # Hard exit (the reference's rte_exit discipline, common.h:33-39):
    # jax's atexit teardown can hang through the dev tunnel after the
    # results are already printed.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
