import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import bitar_tpu as bt

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

import jax
cfg = bt.EngineConfig(codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=NBLOCKS,
                      max_pool_slots=NBLOCKS + 32,
                      use_tpu_kernels=True, interpret=False)
eng = bt.Engine(cfg).initialize()
unit = eng.compress(data)
print("staging cached on unit:", unit._staging is not None)

t0 = time.perf_counter()
staging = eng._staging_rows(unit)
t1 = time.perf_counter()
print(f"_staging_rows: {(t1-t0)*1e3:.0f} ms (shape {staging.shape})")

t0 = time.perf_counter()
plans = eng._build_plans(unit.manifest, staging)
t1 = time.perf_counter()
print(f"_build_plans: {(t1-t0)*1e3:.0f} ms")

# second build to see warm cost
t0 = time.perf_counter()
plans = eng._build_plans(unit.manifest, staging)
t1 = time.perf_counter()
print(f"_build_plans warm: {(t1-t0)*1e3:.0f} ms")
import os; os._exit(0)
