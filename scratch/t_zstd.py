import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import zstandard
from bitar_tpu.ops.cpu import native

rng = np.random.default_rng(5)
fails = ok = 0
cases = []
for n in (0, 1, 5, 100, 1000, 5000, 65536, 131072):
    if n:
        cases.append(("text%d" % n, (b"the zstd decoder test %d " % n) * (n // 20 + 1)))
        cases.append(("rand%d" % n, rng.integers(0, 256, n, dtype=np.uint8).tobytes()))
        cases.append(("low%d" % n, rng.integers(0, 6, n, dtype=np.uint8).tobytes()))
        cases.append(("rle%d" % n, b"\x7f" * n))
        rec = np.zeros((n // 16 + 1, 16), dtype=np.uint8); rec[:, 0] = np.arange(rec.shape[0]) & 0xFF
        cases.append(("struct%d" % n, rec.tobytes()[:n]))
    else:
        cases.append(("empty", b""))
for level in (1, 3, 9, 19):
    for name, data in cases:
        data = data[:131072]
        comp = zstandard.ZstdCompressor(level=level).compress(data)
        try:
            out = native.zstd_decompress(comp, len(data) + 16)
            if out.tobytes() == data:
                ok += 1
            else:
                fails += 1
                print(f"MISMATCH lvl{level} {name}: got {len(out)} want {len(data)}")
        except Exception as e:
            fails += 1
            print(f"FAIL lvl{level} {name}: {str(e)[:80]}")
print(f"ok={ok} fails={fails}")
