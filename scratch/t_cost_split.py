"""Split decode time into per-block fixed vs per-pass marginal cost.

Times the flat kernel with the real corpus plans vs the same plans
truncated to the first CB passes (comp-only minimum), and at half the
block count.  fixed+marginal regression tells which lever matters:
active-cell compaction (per-pass) or per-block overhead reduction.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
import bitar_tpu as bt
from bitar_tpu.ops.pallas.lz4_decode_flat import bias_planes, decode_blocks_flat, CB

BLOCK = 128 * 1024
NBLOCKS = 64
def make_corpus(nblocks):
    rng = np.random.default_rng(2026)
    parts = []
    for i in range(nblocks):
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
    return b"".join(parts)

data = make_corpus(NBLOCKS)
cfg = bt.EngineConfig(codec=bt.Codec.LZ4, block_size=BLOCK, burst_size=NBLOCKS,
                      max_pool_slots=NBLOCKS + 32, use_tpu_kernels=True)
eng = bt.Engine(cfg).initialize()
unit = eng.compress(data)
eng.ensure_plans(unit)
p = unit.plan_flat
comp_rows = unit.plan_comp_rows
nrows = BLOCK // 128
rows_dev = eng.arena.gather_burst([r.slot for r in unit.refs])
planes = bias_planes(rows_dev, comp_rows)
se_dev, shift_dev = unit.plan_device_arrays()

def timed(tag, planes_, p_used_, p_off_, p0_, nb):
    pu = jnp.asarray(p_used_); po = jnp.asarray(p_off_); pz = jnp.asarray(p0_)
    def launch():
        return decode_blocks_flat(planes_, pu, po, pz, se_dev, shift_dev,
                                  comp_rows=comp_rows, out_rows=nrows)
    o = launch(); np.asarray(o[0,0,:1])
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        last = None
        for _ in range(16):
            last = launch()
        np.asarray(last[0,0,:1])
        best = min(best, (time.perf_counter()-t0)/16)
    tot = int(p_used_[:nb].sum())
    print(f"{tag}: {best*1e3:.3f} ms  blocks={nb} passes={tot} "
          f"us/pass={best*1e6/max(tot,1):.2f}", file=sys.stderr)
    return best

pu, po, p0 = p["p_used"], p["p_off"], p["p0"]
t_full = timed("full      ", planes, pu, po, p0, NBLOCKS)
# minimum passes: CB comp passes only per block (wrong output, same shapes)
pu_min = np.full(NBLOCKS, CB, np.int32)
p0_min = np.full(NBLOCKS, CB, np.int32)
t_min = timed("min-passes", planes, pu_min, po, p0_min, NBLOCKS)
# zero-pass variant: p_used=0 -> measures pure launch+init+store
pu_zero = np.zeros(NBLOCKS, np.int32)
t_zero = timed("zero-pass ", planes, pu_zero, po, pu_zero, NBLOCKS)
# half the blocks
t_half = timed("half-blocks", planes[:32], pu[:32], po[:32], p0[:32], 32)

S = int(pu.sum())
per_pass = (t_full - t_min) / (S - CB * NBLOCKS)
fixed = t_min / NBLOCKS - CB * per_pass
print(f"-> per-pass {per_pass*1e6:.2f} us, per-block fixed {fixed*1e6:.1f} us, "
      f"launch floor {t_zero*1e3:.3f} ms", file=sys.stderr)
eng.recycle(unit); eng.release()
