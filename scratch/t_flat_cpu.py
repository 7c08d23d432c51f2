import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.pallas.lz4_decode_flat import (
    decode_blocks_flat, build_flat_plans, decode_flat_numpy)

rng = np.random.default_rng(7)
BLOCK = 16 * 1024
NROWS = BLOCK // 128

cases = {
    "text": (b"plan me please, flat kernel! " * 800)[:BLOCK],
    "random": bytes(rng.integers(0, 256, BLOCK, dtype=np.uint8)),
    "rle": b"\x37" * BLOCK,
    "struct": np.repeat(np.arange(BLOCK // 16, dtype=np.uint8), 16).tobytes(),
    "mixed": (b"ab" * 100 + bytes(rng.integers(0, 256, 300, dtype=np.uint8))) * 41,
}
cases = {k: v[:BLOCK] for k, v in cases.items()}

comps, raw_plans = [], []
for name, data in cases.items():
    comp = native.lz4_compress(data)
    P, p0, cols = native.plan_block(comp, len(data), NROWS, max_passes=96, codec="lz4")
    assert P is not None, name
    comps.append(comp)
    raw_plans.append((P, p0, cols))
    print(name, "P=", P, "p0=", p0, "comp=", len(comp))

comp_rows = -(-max(len(c) for c in comps) // 128)
comp_rows = -(-comp_rows // 128) * 128
n = len(comps)
plans = build_flat_plans(raw_plans, comp_rows, NROWS)

planes = np.zeros((n, comp_rows, 128), np.uint8)
for i, c in enumerate(comps):
    planes[i].reshape(-1)[:len(c)] = np.frombuffer(bytes(c), np.uint8)

oracle = decode_flat_numpy(comps, plans, comp_rows, NROWS)
for i, (name, data) in enumerate(cases.items()):
    got = oracle[i].reshape(-1)[:len(data)].tobytes()
    print("oracle", name, "OK" if got == data else "MISMATCH")

import jax.numpy as jnp
planes_i8 = (planes.astype(np.int32) - 128).astype(np.int8)
out = decode_blocks_flat(
    jnp.asarray(planes_i8), jnp.asarray(plans["p_used"]), jnp.asarray(plans["p_off"]),
    jnp.asarray(plans["p0"]),
    jnp.asarray(plans["se"]), jnp.asarray(plans["shift"]),
    comp_rows=comp_rows, out_rows=NROWS, interpret=True)
out = np.asarray(out)
for i, (name, data) in enumerate(cases.items()):
    got = out[i].reshape(-1)[:len(data)].tobytes()
    print("kernel", name, "OK" if got == data else "MISMATCH")
