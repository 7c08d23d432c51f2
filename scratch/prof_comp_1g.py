import sys, time, cProfile, pstats
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import bitar_tpu as bt
from bitar_tpu.cli.configs_bench import _mixed_buffer

GIB = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
nbytes = int(GIB * (1 << 30))
data = _mixed_buffer(nbytes)
nblocks = -(-nbytes // (128 * 1024))
cfg = bt.EngineConfig(codec=bt.Codec.LZ4, block_size=128 * 1024,
                      max_pool_slots=nblocks + 32,
                      burst_size=256, use_tpu_kernels=True)
eng = bt.Engine(cfg).initialize()

# warm (compiles)
t0 = time.perf_counter()
u = eng.compress(data[: 64 << 20])
print("warm 64MiB compress:", round(time.perf_counter() - t0, 2), "s",
      flush=True)
eng.recycle(u)

pr = cProfile.Profile()
t0 = time.perf_counter()
pr.enable()
u = eng.compress(data)
pr.disable()
dt = time.perf_counter() - t0
print(f"compress {GIB} GiB: {dt:.2f}s = {nbytes/dt/1e9:.3f} GB/s", flush=True)
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(25)
eng.recycle(u)
eng.release()
