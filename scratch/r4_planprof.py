"""Per-class native plan-build cost (round 4: the plan-build cliff)."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from bitar_tpu.ops.cpu import native

BLOCK = 128 * 1024
NROWS = BLOCK // 128
N = 64
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
        tag = b"[[blk %06d]]" % i
        buf[:len(tag)] = tag
        return bytes(buf)

for kind in ("text", "low", "rand", "rle", "md"):
    comps = [np.asarray(native.lz4_compress(mk(kind, i))) for i in range(N)]
    lens = np.array([len(c) for c in comps], np.int32)
    src = np.concatenate(comps)
    off = np.zeros(N, np.int64); off[1:] = np.cumsum(lens[:-1].astype(np.int64))
    outl = np.full(N, BLOCK, np.int32)
    cids = np.zeros(N, np.int32)
    for nth in (1, 4):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            ctx, pu, p0, st, lu, dq, ra, ds = native.plan_batch_begin(
                src, off, lens, outl, cids, NROWS, 160, cb=4, nthreads=nth)
            native.plan_batch_abort(ctx)
            best = min(best, time.perf_counter() - t0)
        print(f"{kind:5s} nth={nth}: {best*1e3:8.1f} ms "
              f"({N*BLOCK/best/1e9:6.3f} GB/s) passes={int(pu.sum())} "
              f"dense={int(np.maximum(ds,0).sum())} ok={int((st==0).sum())}")
