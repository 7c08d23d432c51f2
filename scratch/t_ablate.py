"""Ablate the flat kernel's per-pass cost components on the bench corpus.

A: baseline            (comp+out phases, correct)
B: comp-phase only     (p_used=p0: isolates comp pass cost)
C: no mirror rolls     (monkeypatched jnp.roll -> identity; wrong output,
                        times the relayout cost of mirror upkeep)
"""
import os, sys, time, types
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
import bitar_tpu as bt
from bitar_tpu.ops.pallas import lz4_decode_flat as flat

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
planes = flat.bias_planes(rows_dev, comp_rows)
se_dev, shift_dev = unit.plan_device_arrays()

def timed(tag, p_used_, p0_, reps=16):
    pu = jnp.asarray(p_used_); po = jnp.asarray(p["p_off"]); pz = jnp.asarray(p0_)
    def launch():
        return flat.decode_blocks_flat(planes, pu, po, pz, se_dev, shift_dev,
                                       comp_rows=comp_rows, out_rows=nrows)
    o = launch(); np.asarray(o[0,0,:1])
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        last = None
        for _ in range(reps):
            last = launch()
        np.asarray(last[0,0,:1])
        best = min(best, (time.perf_counter()-t0)/reps)
    tot = int(p_used_.sum())
    print(f"{tag}: {best*1e3:.3f} ms passes={tot}", file=sys.stderr, flush=True)
    return best

pu, p0 = p["p_used"], p["p0"]
tA = timed("A baseline ", pu, p0)
tB = timed("B comp-only", p0, p0)

class _JnpNoRoll:
    def __getattr__(self, name):
        if name == "roll":
            return lambda x, s, axis=0: x
        return getattr(jnp, name)
flat.jnp = _JnpNoRoll()
flat.decode_blocks_flat.clear_cache()
tC = timed("C no-rolls ", pu, p0)
flat.jnp = jnp
flat.decode_blocks_flat.clear_cache()

S, S0 = int(pu.sum()), int(p0.sum())
print(f"-> comp-pass {tB*1e6/S0:.2f} us (n={S0}); out-phase extra "
      f"{(tA-tB)*1e6/max(S-S0,1):.2f} us/pass (n={S-S0}); rolls cost "
      f"{(tA-tC)*1e3:.3f} ms of {tA*1e3:.3f}", file=sys.stderr)
eng.recycle(unit); eng.release()
