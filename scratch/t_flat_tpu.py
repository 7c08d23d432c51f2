# A/B: old dense planned kernel vs new flat int8 kernel, bench corpus,
# chained-repeat timing (launches pipeline; one sync at the end).
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import bitar_tpu as bt
from bitar_tpu.ops.pallas.lz4_decode_planned import decode_blocks_planned
from bitar_tpu.ops.pallas.lz4_decode_flat import decode_blocks_flat, build_flat_plans

BLOCK = 128 * 1024
NBLOCKS = 64
NROWS = BLOCK // 128

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
print("ratio", round(unit.manifest.ratio(), 3), "passes", unit.plan_passes,
      "p_used", unit.plan_p_used.tolist()[:8], "comp_rows", unit.plan_comp_rows, file=sys.stderr)

comp_rows = unit.plan_comp_rows
rows = np.asarray(eng.arena.gather_burst([r.slot for r in unit.refs]))
planes_np = rows[:, :comp_rows * 128].reshape(NBLOCKS, comp_rows, 128)
planes = jnp.asarray(planes_np)
p_used_np = unit.plan_p_used
p_used = jnp.asarray(p_used_np)

# dense wire
se_d = jnp.asarray(unit.plan_se.reshape(NBLOCKS, unit.plan_passes, NROWS // 128, 128))
sh_d = jnp.asarray(unit.plan_shift.reshape(NBLOCKS, unit.plan_passes, NROWS // 128, 128))

# re-plan each block for the flat wire (planner outputs, not dense tables)
from bitar_tpu.ops.cpu import native
from bitar_tpu.ops import registry
from bitar_tpu.config import Codec
from bitar_tpu.manifest import codec_from_id
raw_plans = []
m = unit.manifest
for i in range(NBLOCKS):
    codec = codec_from_id(int(m.codec_ids[i]))
    comp_b = planes_np[i].reshape(-1)[:int(m.comp_len[i])]
    if codec == Codec.RAW:
        cols = {k: np.zeros((1, NROWS), np.int32) for k in ("r_dstart", "r_dend", "r_shift")}
        rl = int(m.raw_len[i]); ru = -(-rl // 128)
        cols["r_dend"][0, :ru] = np.minimum(rl, (np.arange(ru) + 1) * 128)
        raw_plans.append((1, 1, cols))
    else:
        native.set_split_limit(8)
        P, p0, cols = native.plan_block(comp_b, int(m.raw_len[i]), NROWS, max_passes=96, codec="lz4")
        raw_plans.append((P, p0, cols))
comp_rows = -(-comp_rows // 128) * 128
planes_np = rows[:, :comp_rows * 128].reshape(NBLOCKS, comp_rows, 128) if rows.shape[1] >= comp_rows*128 else np.pad(rows, ((0,0),(0, comp_rows*128 - rows.shape[1]))).reshape(NBLOCKS, comp_rows, 128)
planes_i8 = jnp.asarray((planes_np.astype(np.int32) - 128).astype(np.int8))
plans = build_flat_plans(raw_plans, comp_rows, NROWS)
se_fd = jnp.asarray(plans["se"]); sh_fd = jnp.asarray(plans["shift"])
p_off = jnp.asarray(plans["p_off"]); p_used_f = jnp.asarray(plans["p_used"])
p0_d = jnp.asarray(plans["p0"])
S = int(plans["p_used"].sum())
print(f"plan wire: dense {unit.plan_se.nbytes + unit.plan_shift.nbytes:,} B, "
      f"flat {plans['se'].nbytes + plans['shift'].nbytes:,} B; S={S} mean={S/NBLOCKS:.1f} "
      f"comp-pass frac={plans['p0'].sum()/S:.2f}", file=sys.stderr)

def run_dense():
    return decode_blocks_planned(planes, p_used, se_d, sh_d,
                                 passes=unit.plan_passes, comp_rows=comp_rows,
                                 out_rows=NROWS)

def run_flat():
    return decode_blocks_flat(planes_i8, p_used_f, p_off, p0_d,
                              se_fd, sh_fd, comp_rows=comp_rows, out_rows=NROWS)

def timeit(fn, tag, reps=8):
    t0 = time.perf_counter()
    o = fn()
    np.asarray(o[0, 0, :1])
    t1 = time.perf_counter()
    print(f"{tag}: first(compile+run) {t1-t0:.1f} s", file=sys.stderr)
    # verify
    host = np.asarray(o)
    flat = host.reshape(NBLOCKS, -1)[:, :BLOCK].reshape(-1).tobytes()
    ok = flat == data
    print(f"{tag}: bit-exact={ok}", file=sys.stderr)
    assert ok
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        last = None
        for _ in range(reps):
            last = fn()
        np.asarray(last[0, 0, :1])
        dt = (time.perf_counter() - t0) / reps
        best = min(best, dt)
    print(f"{tag}: {best*1e3:.2f} ms/decode ({len(data)/best/1e9:.2f} GB/s)", file=sys.stderr)
    return best

tf = timeit(run_flat, "flat-int8")
td = timeit(run_dense, "dense-bf16")
print(f"speedup: {td/tf:.2f}x", file=sys.stderr)
eng.recycle(unit); eng.release()
