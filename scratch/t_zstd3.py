import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, zstandard
from bitar_tpu.ops.cpu import native

rng = np.random.default_rng(123)
for trial in range(4000):
    n = int(rng.integers(50000, 300000))
    d = rng.integers(0, int(rng.integers(2, 40)), n, dtype=np.uint8).tobytes()
    lvl = int(rng.integers(5, 18))
    comp = zstandard.ZstdCompressor(level=lvl).compress(d)
    try:
        out = native.zstd_decompress(comp, len(d) + 32)
        if out.tobytes() != d:
            print("MISMATCH", trial, n, lvl); break
    except Exception as e:
        print("FAIL", trial, n, lvl, str(e)[:50])
        np.save('/tmp/zfail_data.npy', np.frombuffer(d, np.uint8))
        open('/tmp/zfail_comp.bin','wb').write(comp)
        break
else:
    print("no failure in 4000")
