"""Markdown device-compress ratio sweep: wcap x fft_k x detect_k.

Levers from NEXT_STEPS 4: the offload ratio trails the host matcher
(3.31 vs 5.68 markdown) because matching is offset-candidate-restricted
and the parse truncates at wcap=8 sequences/segment.  Measure both
ratio and wall time per lever on the real text corpus.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

from bench import BLOCK, make_text_corpus  # noqa: E402
from bitar_tpu.ops.device_compress import compress_blocks_device  # noqa: E402
from bitar_tpu.ops.cpu import native as _native  # noqa: E402

ND = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CHUNK = 64
TOW = 49152

tplanes = np.frombuffer(make_text_corpus(ND)[:ND * BLOCK], np.uint8).reshape(
    ND, BLOCK)

# Host baseline ratio for the same corpus.
hs = 0
for i in range(ND):
    hb = np.asarray(_native.lz4_compress(tplanes[i]))
    hs += min(len(hb), BLOCK)
print(f"host ratio {ND * BLOCK / hs:.3f}", flush=True)

for wcap in (8, 16, 32):
    for dk in (4,):
        t0 = time.perf_counter()
        tot = 0
        ndev = 0
        for s in range(0, ND, CHUNK):
            tdp = jax.device_put(tplanes[s:s + CHUNK])
            tl = jax.device_put(np.full(tdp.shape[0], BLOCK, np.int32))
            tout, tsizes = compress_blocks_device(
                tdp, tl, seg=1024, min_match=6, out_width=TOW,
                detect_fft="sample", detect_k=dk, wcap=wcap)
            tsz = np.asarray(tsizes)
            th = np.asarray(tout)
            for i in range(tdp.shape[0]):
                if tsz[i] >= BLOCK or tsz[i] > TOW:
                    tot += BLOCK
                    continue
                ndev += 1
                dec = np.asarray(_native.lz4_decompress(th[i, :tsz[i]], BLOCK))
                assert dec.tobytes() == tplanes[s + i].tobytes(), (wcap, s + i)
                tot += int(tsz[i])
        dt = time.perf_counter() - t0
        print(f"wcap={wcap} dk={dk}: ratio {ND * BLOCK / tot:.3f} "
              f"({ndev}/{ND} dev) {ND * BLOCK / dt / 1e9:.2f} GB/s "
              f"{dt*1e3:.0f} ms", flush=True)
