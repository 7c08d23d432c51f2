"""Fused device-compress verify + timing at N=256, OW=2048 + adaptive."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bitar_tpu.ops.device_compress import compress_blocks_device
from bitar_tpu.ops.cpu import native

BLOCK = 128 * 1024
N = 256
rng = np.random.default_rng(2026)
planes = np.zeros((N, BLOCK), np.uint8)
for i in range(N):
    k = i % 4
    if k == 0:
        p = ((b"The quick brown fox jumps over the lazy dog %d. " % i) * (BLOCK // 47 + 1))[:BLOCK]
    elif k == 1:
        p = rng.integers(0, 16, BLOCK, dtype=np.uint8).tobytes()
    elif k == 2:
        p = rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes()
    else:
        p = bytes([i & 0xFF]) * BLOCK
    planes[i] = np.frombuffer(p, np.uint8)
dpl = jax.device_put(jnp.asarray(planes))
dlen = jax.device_put(jnp.full(N, BLOCK, np.int32))

# adaptive width: what does it pick?
t0 = time.perf_counter()
out, sizes = compress_blocks_device(dpl, dlen, seg=512, min_match=6)
szs = np.asarray(sizes)
print(f"adaptive: width={out.shape[1]} compile+run {time.perf_counter()-t0:.1f}s "
      f"maxgood={szs[szs < BLOCK].max(initial=0)}", flush=True)
host = np.asarray(out)
ok = bad = fb = 0
comp_total = 0
for i in range(N):
    if szs[i] >= BLOCK or szs[i] > out.shape[1]:
        comp_total += BLOCK
        fb += 1
        continue
    dec = np.asarray(native.lz4_decompress(host[i, :szs[i]], BLOCK))
    comp_total += int(szs[i])
    if dec.tobytes() == planes[i].tobytes(): ok += 1
    else: bad += 1
print(f"verify: ok={ok} bad={bad} fallback={fb} ratio={N*BLOCK/comp_total:.3f}", flush=True)
assert bad == 0

for segv, mmv, W in ((512, 512, 2048), (1024, 1024, 2048)):
    out, sizes = compress_blocks_device(dpl, dlen, seg=segv, min_match=6,
                                        max_match=mmv, out_width=W)
    szs = np.asarray(sizes)
    host = np.asarray(out)
    bad2 = 0
    comp_total = 0
    for i in range(N):
        if szs[i] >= BLOCK or szs[i] > W:
            comp_total += BLOCK
            continue
        dec = np.asarray(native.lz4_decompress(host[i, :szs[i]], BLOCK))
        comp_total += int(szs[i])
        if dec.tobytes() != planes[i].tobytes(): bad2 += 1
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(6):
            r = compress_blocks_device(dpl, dlen, seg=segv, min_match=6,
                                       max_match=mmv, out_width=W)
        np.asarray(r[0].reshape(-1)[:1]); np.asarray(r[1][:1])
        best = min(best, (time.perf_counter()-t0)/6)
    print(f"seg={segv} OW={W}: {best*1e3:7.2f} ms ({N*BLOCK/best/1e9:.3f} GB/s) "
          f"ratio={N*BLOCK/comp_total:.3f} bad={bad2}", flush=True)
