"""Host vs device-matcher compression ratio per corpus class."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.device_compress import compress_blocks_device

BLOCK = 128 * 1024
N = 8
rng = np.random.default_rng(2026)

def mk(kind, i):
    if kind == "text":
        return ((b"The quick brown fox jumps over the lazy dog %d. " % i)
                * (BLOCK // 47 + 1))[:BLOCK]
    if kind == "low":
        return rng.integers(0, 16, BLOCK, dtype=np.uint8).tobytes()
    if kind == "rand":
        return rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes()
    if kind == "rle":
        return bytes([i & 0xFF]) * BLOCK
    if kind == "md":
        base = open('/root/repo/SURVEY.md', 'rb').read()
        reps = -(-BLOCK // len(base))
        buf = bytearray((base * reps)[:BLOCK])
        buf[:12] = b"[[b %06d]]" % i
        return bytes(buf)

tot_h = tot_d = tot_raw = 0
for kind in ("text", "low", "rand", "rle", "md"):
    planes = np.zeros((N, BLOCK), np.uint8)
    for i in range(N):
        planes[i] = np.frombuffer(mk(kind, i), np.uint8)
    hsz = sum(min(len(native.lz4_compress(planes[i].tobytes())), BLOCK)
              for i in range(N))
    out, sizes = compress_blocks_device(
        jnp.asarray(planes), np.full(N, BLOCK, np.int32), seg=512,
        min_match=6, out_width=BLOCK)
    dsz = int(np.minimum(np.asarray(sizes), BLOCK).sum())
    print(f"{kind:5s}: host ratio {N*BLOCK/hsz:7.2f}  device ratio "
          f"{N*BLOCK/dsz:7.2f}   (host {hsz} B, dev {dsz} B)")
    tot_h += hsz; tot_d += dsz; tot_raw += N * BLOCK
print(f"mixed(5-class): host {tot_raw/tot_h:.3f}  device {tot_raw/tot_d:.3f}")
m4h = m4d = 0
for kind in ("text", "low", "rand", "rle"):
    pass
