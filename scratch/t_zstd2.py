import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, zstandard
from bitar_tpu.ops.cpu import native

rng = np.random.default_rng(99)
fails = ok = 0
def check(tag, data, comp):
    global ok, fails
    try:
        out = native.zstd_decompress(comp, len(data) + 32)
        if out.tobytes() == data:
            ok += 1
        else:
            fails += 1; print("MISMATCH", tag, len(out), len(data))
    except Exception as e:
        fails += 1; print("FAIL", tag, str(e)[:60])

# random fuzz across sizes/levels/content
for trial in range(300):
    n = int(rng.integers(0, 300000))
    kind = trial % 5
    if kind == 0:
        d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    elif kind == 1:
        d = rng.integers(0, int(rng.integers(2, 40)), n, dtype=np.uint8).tobytes()
    elif kind == 2:
        d = (b"fuzz %d " % trial) * (n // 7 + 1); d = d[:n]
    elif kind == 3:
        d = bytes([trial & 0xFF]) * n
    else:
        rec = np.zeros((n // 32 + 1, 32), np.uint8); rec[:, 0] = np.arange(rec.shape[0]) & 0xFF
        rec[:, 7] = rng.integers(0, 256, rec.shape[0], dtype=np.uint8)
        d = rec.tobytes()[:n]
    lvl = int(rng.integers(1, 20))
    cksum = bool(rng.integers(0, 2))
    comp = zstandard.ZstdCompressor(level=lvl, write_checksum=cksum).compress(d)
    check(f"t{trial}/n{n}/l{lvl}", d, comp)
print(f"decode fuzz: ok={ok} fails={fails}")

# parse reconstruction: table + literals -> numpy rebuild == data
ok2 = fails2 = 0
for trial in range(120):
    n = int(rng.integers(1, 100000))
    kind = trial % 4
    if kind == 0:
        d = (b"parse me %d " % trial) * (n // 9 + 1); d = d[:n]
    elif kind == 1:
        d = rng.integers(0, 8, n, dtype=np.uint8).tobytes()
    elif kind == 2:
        d = bytes([trial & 0xFF]) * n
    else:
        d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    lvl = int(rng.integers(1, 20))
    comp = zstandard.ZstdCompressor(level=lvl).compress(d)
    try:
        t, lits = native.zstd_parse(comp)
        out = np.zeros(n + 8, np.uint8)
        pos = 0
        for i in range(t["lit_ptr"].shape[0]):
            lp, ll, off, ml, op = (int(t[k][i]) for k in ("lit_ptr", "lit_len", "off", "mlen", "out_pos"))
            assert op == pos, (op, pos)
            out[pos:pos+ll] = lits[lp:lp+ll]; pos += ll
            for k in range(ml):
                out[pos+k] = out[pos-off+k]
            pos += ml
        if pos == n and out[:n].tobytes() == d:
            ok2 += 1
        else:
            fails2 += 1; print("PARSE MISMATCH", trial, pos, n)
    except Exception as e:
        fails2 += 1; print("PARSE FAIL", trial, str(e)[:60])
print(f"parse fuzz: ok={ok2} fails={fails2}")
