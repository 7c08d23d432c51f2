import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np, jax, jax.numpy as jnp
from bitar_tpu.ops.device_compress import compress_blocks_device
from bitar_tpu.ops.cpu import native

BLOCK = 128 * 1024
N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SEG = int(sys.argv[2]) if len(sys.argv) > 2 else 512
rng = np.random.default_rng(2026)
planes = np.zeros((N, BLOCK), np.uint8)
for i in range(N):
    k = i % 4
    if k == 0:
        p = (b"The quick brown fox jumps over the lazy dog %d. " % i) * (BLOCK // 47 + 1)
    elif k == 1:
        p = rng.integers(0, 16, BLOCK, np.uint8).tobytes()
    elif k == 2:
        p = rng.integers(0, 256, BLOCK, np.uint8).tobytes()
    else:
        p = bytes([i & 0xFF]) * BLOCK
    planes[i] = np.frombuffer(p[:BLOCK], np.uint8)
lengths = np.full(N, BLOCK, np.int32)

dplanes = jax.device_put(planes)
dlengths = jax.device_put(lengths)
jax.block_until_ready(dplanes); np.asarray(dplanes[0, :1])

t0 = time.perf_counter()
out, sizes = compress_blocks_device(dplanes, dlengths, seg=SEG, min_match=6)
szs = np.asarray(sizes)
print(f"first call (compile+run): {time.perf_counter()-t0:.1f}s", file=sys.stderr)

# verify round-trip through host decoder
host_out = np.asarray(out)
ok = 0
for i in range(N):
    if szs[i] >= BLOCK:   # engine would store RAW
        ok += 1; continue
    dec = np.asarray(native.lz4_decompress(host_out[i, :szs[i]], BLOCK))
    ok += dec.tobytes() == planes[i].tobytes()
print(f"roundtrip: {ok}/{N} ok, ratio={N*BLOCK/szs.sum():.3f}", file=sys.stderr)

REPS = 4
for run in range(3):
    t0 = time.perf_counter()
    last = None
    for _ in range(REPS):
        last = compress_blocks_device(dplanes, dlengths, seg=SEG, min_match=6)
    np.asarray(last[1][:1])   # sync
    dt = (time.perf_counter() - t0) / REPS
    print(f"devcomp N={N} seg={SEG} run {run}: {dt*1e3:.2f} ms/launch ({N*BLOCK/dt/1e9:.3f} GB/s)")
