import sys, time, os
sys.path.insert(0, '/root/repo')
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax
import bitar_tpu as bt
from bitar_tpu.ops.pallas import lz4_decode_flat as F
from bitar_tpu.ops.cpu import native

BLOCK = 128 * 1024
NROWS = BLOCK // 128
NBLOCKS = 256
REPS = 8
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
comps = [np.asarray(native.lz4_compress(p)) for p in parts]
lens = np.array([len(c) for c in comps], np.int32)
src = np.concatenate(comps)
off = np.zeros(NBLOCKS, np.int64); off[1:] = np.cumsum(lens[:-1])

def run(cb):
    F.CB = cb
    F.DCHUNK = cb
    ctx, pu, p0, st, lu = native.plan_batch_begin(
        src, off, lens, np.full(NBLOCKS, BLOCK, np.int32),
        np.zeros(NBLOCKS, np.int32), NROWS, 160, cb=cb)
    assert (st == 0).all()
    p_off = np.zeros(NBLOCKS, np.int64); p_off[1:] = np.cumsum(pu[:-1])
    S = int(pu.sum())
    S_pad = -(-(S + cb) // F._S_QUANTUM) * F._S_QUANTUM
    tiles = NROWS // 128
    se = np.zeros((S_pad, tiles, 128), np.int16)
    sh = np.zeros((S_pad, tiles, 128), np.int32)
    native.plan_batch_pack(ctx, p_off, se, sh)
    comp_rows = max(128, -(-int(lens.max()) // 128))
    comp_rows = -(-comp_rows // 128) * 128
    comp_rows = -(-comp_rows // F.KBAND) * F.KBAND
    slot = comp_rows * 128
    staging = np.zeros((NBLOCKS, slot), np.uint8)
    for i, c in enumerate(comps):
        staging[i, :len(c)] = c
    planes = F.bias_planes(jax.device_put(staging), comp_rows)
    d = dict(p_used=jax.device_put(pu.astype(np.int32)),
             p_off=jax.device_put(p_off.astype(np.int32)),
             p0=jax.device_put(p0.astype(np.int32)),
             se=jax.device_put(se), sh=jax.device_put(sh))
    def launch():
        return F.decode_blocks_flat(planes, d["p_used"], d["p_off"], d["p0"],
                                    d["se"], d["sh"], comp_rows=comp_rows,
                                    out_rows=NROWS)
    t0 = time.perf_counter()
    o = launch(); np.asarray(o[0, 0, :1])
    print(f"cb={cb}: compile+first {time.perf_counter()-t0:.1f}s passes={S}")
    host = np.asarray(o)
    assert host.reshape(NBLOCKS, -1)[:, :BLOCK].reshape(-1).tobytes() == data, "mismatch"
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        last = None
        for _ in range(REPS):
            last = launch()
        np.asarray(last[0, 0, :1])
        best = min(best, (time.perf_counter() - t0) / REPS)
    gbps = len(data) / best / 1e9
    print(f"cb={cb}: {best*1e3:.2f} ms/launch ({gbps:.3f} GB/s, "
          f"{best*1e6/S:.2f} us/pass)")

run(4)
run(8)
os._exit(0)
