"""Decompose the 23.8 us/block fixed cost of the flat kernel.

Hypothesis: the VMEM-resident plan BlockSpec re-fetches the full plan
arrays every grid step (despite the constant index map), charging
~plan_bytes/HBM_BW per block.  Test: zero-pass launches with small vs
large plan arrays, VMEM vs HBM mode.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
from bitar_tpu.ops.pallas import lz4_decode_flat as flat

NB = 64
comp_rows = 1024
nrows = 1024
rng = np.random.default_rng(0)
planes = jnp.asarray(rng.integers(-128, 128, (NB, comp_rows, 128), np.int8))
pu = jnp.zeros(NB, jnp.int32)
po = jnp.zeros(NB, jnp.int32)


def timed(tag, S, vmem_limit):
    se = jnp.zeros((S, nrows // 128, 128), jnp.int16)
    sh = jnp.zeros((S, nrows // 128, 128), jnp.int32)
    old = flat._PLANS_VMEM_BYTES
    flat._PLANS_VMEM_BYTES = vmem_limit
    flat.decode_blocks_flat.clear_cache()
    try:
        def launch():
            return flat.decode_blocks_flat(planes, pu, po, pu, se, sh,
                                           comp_rows=comp_rows, out_rows=nrows)
        o = launch(); np.asarray(o[0, 0, :1])
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(16):
                last = launch()
            np.asarray(last[0, 0, :1])
            best = min(best, (time.perf_counter() - t0) / 16)
        mb = (se.nbytes + sh.nbytes) / 1e6
        print(f"{tag}: S={S} plans={mb:.1f} MB -> {best*1e3:.3f} ms "
              f"({best*1e6/NB:.1f} us/blk)", file=sys.stderr, flush=True)
    finally:
        flat._PLANS_VMEM_BYTES = old
        flat.decode_blocks_flat.clear_cache()


timed("vmem small", 512, 12 * 1024 * 1024)
timed("vmem large", 1664, 16 * 1024 * 1024)
timed("hbm  large", 1664, 0)
timed("hbm  small", 512, 0)
