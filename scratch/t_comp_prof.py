"""Profile compress phases at n256."""
import sys, os, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import bitar_tpu as bt
from bitar_tpu.ops.cpu import native

BLOCK = 128 * 1024
NBLOCKS = 256
rng = np.random.default_rng(2026)
parts = []
for i in range(NBLOCKS):
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
data = b"".join(parts)
raw = np.frombuffer(data, np.uint8)

# raw native batch compress timing (matcher only)
off = (np.arange(NBLOCKS) * BLOCK).astype(np.int64)
lens = np.full(NBLOCKS, BLOCK, np.int32)
slot = 2 * BLOCK
dst = np.empty(NBLOCKS * slot, np.uint8)
dst_off = (np.arange(NBLOCKS) * slot).astype(np.int64)
caps = np.full(NBLOCKS, slot, np.int32)
for trial in range(3):
    t0 = time.perf_counter()
    dl, st = native.batch_run(True, "lz4", raw, off, lens, dst, dst_off, caps)
    dt = time.perf_counter() - t0
    print(f"native lz4 batch compress: {dt*1e3:.1f} ms ({len(data)/dt/1e9:.3f} GB/s)")

cfg = bt.EngineConfig(codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=NBLOCKS,
                      max_pool_slots=NBLOCKS + 32)
eng = bt.Engine(cfg).initialize()
import bitar_tpu.engine.device as D
import cProfile, pstats
u = eng.compress(data); eng.recycle(u)   # warm
t0 = time.perf_counter()
u = eng.compress(data)
print(f"engine compress: {(time.perf_counter()-t0)*1e3:.1f} ms")
eng.recycle(u)
pr = cProfile.Profile()
pr.enable()
u = eng.compress(data)
pr.disable()
eng.recycle(u)
ps = pstats.Stats(pr).sort_stats("cumulative")
ps.print_stats(18)
eng.release()
