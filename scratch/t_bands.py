import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from bitar_tpu.ops.cpu import native
from bitar_tpu.ops.pallas.lz4_decode_flat import (
    build_flat_plans, decode_blocks_flat, compute_bands, bands_supported,
    KBAND)

BLOCK = 128 * 1024
NROWS = BLOCK // 128
rng = np.random.default_rng(7)
datas = [
    (b"banded gather check " * (BLOCK // 19 + 1))[:BLOCK],
    rng.integers(0, 8, BLOCK, dtype=np.uint8).tobytes(),
    b"\x77" * BLOCK,
    rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes(),
]
comps = [np.asarray(native.lz4_compress(d)) for d in datas]
raw_plans = [native.plan_block(c, BLOCK, NROWS, max_passes=96, codec="lz4")
             for c in comps]
assert all(p[0] is not None for p in raw_plans)
comp_rows = -(-max(len(c) for c in comps) // 128)
comp_rows = -(-comp_rows // 128) * 128
if comp_rows > 128:
    comp_rows = -(-comp_rows // KBAND) * KBAND
print("comp_rows", comp_rows, "supported", bands_supported(comp_rows, NROWS))
plans = build_flat_plans(raw_plans, comp_rows, NROWS)
bands = compute_bands(plans, comp_rows, NROWS)
nz = bands[bands != 0]
print("bands nonzero", nz.shape[0], "of", bands.shape[0],
      "max cnt", int((nz & 0xFF).max()), "mean cnt", float((nz & 0xFF).mean()))
n = len(datas)
cp = np.zeros((n, comp_rows, 128), np.uint8)
for i, c in enumerate(comps):
    cp[i].reshape(-1)[:len(c)] = c
cp_i8 = (cp.astype(np.int32) - 128).astype(np.int8)
for use_bands in (None, jnp.asarray(bands)):
    out = np.asarray(decode_blocks_flat(
        jnp.asarray(cp_i8), jnp.asarray(plans["p_used"]),
        jnp.asarray(plans["p_off"]), jnp.asarray(plans["p0"]),
        jnp.asarray(plans["se"]), jnp.asarray(plans["shift"]), use_bands,
        comp_rows=comp_rows, out_rows=NROWS, interpret=True))
    for i, d in enumerate(datas):
        got = out[i].reshape(-1)[:BLOCK].tobytes()
        tag = "banded" if use_bands is not None else "full-K"
        assert got == d, f"{tag} block {i} MISMATCH"
    print(("banded" if use_bands is not None else "full-K"), "bit-exact")
