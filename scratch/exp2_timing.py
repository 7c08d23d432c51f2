# Experiment 2: per-op costs inside a Pallas kernel, amortized over a fori_loop.
# Measures: bf16 vs int8 matmul at gather shapes, one-hot build, rowcast,
# take_along_axis, where-merge. Tunnel: time with host readback of tiny output.
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import lax

ITERS = 200
M, N = 1024, 128

def timeit(fn, *args, tag=""):
    r = np.asarray(fn(*args))  # compile+run
    t0 = time.perf_counter(); r = np.asarray(fn(*args)); t1 = time.perf_counter()
    t2 = time.perf_counter(); r = np.asarray(fn(*args)); t3 = time.perf_counter()
    best = min(t1-t0, t3-t2)
    print(f"{tag}: total {best*1e3:.2f} ms, per-iter {best/ITERS*1e6:.2f} us")
    return best/ITERS

def make(kernel_body, *shapes_dtypes, scratch=None):
    outs = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    def kern(*refs):
        in_refs, o_ref = refs[:-1], refs[-1]
        def body(i, c):
            return kernel_body(i, c, *in_refs)
        acc = lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128), jnp.float32))
        o_ref[...] = acc
    return pl.pallas_call(kern, out_shape=outs)

# --- bf16 matmul [1024,K]x[K,128]
for K in (512, 1024, 2048):
    a = jnp.ones((M, K), jnp.bfloat16); b = jnp.ones((K, N), jnp.bfloat16)
    def body(i, c, a_ref, b_ref):
        r = jnp.dot(a_ref[...] + i.astype(jnp.bfloat16), b_ref[...], preferred_element_type=jnp.float32)
        return c + r[:8, :]
    f = make(body, a, b)
    timeit(f, a, b, tag=f"bf16 mm [1024,{K}]x[{K},128]")

# --- int8 matmul same shapes
for K in (512, 1024, 2048):
    a = jnp.ones((M, K), jnp.int8); b = jnp.ones((K, N), jnp.int8)
    def body(i, c, a_ref, b_ref):
        r = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.int32)
        return c + (r[:8, :] + i).astype(jnp.float32)
    f = make(body, a, b)
    timeit(f, a, b, tag=f"int8 mm [1024,{K}]x[{K},128]")

# --- bf16 matmul wider N=256 (pair-plane)
for K in (512, 1024):
    a = jnp.ones((M, K), jnp.bfloat16); b = jnp.ones((K, 256), jnp.bfloat16)
    def body(i, c, a_ref, b_ref):
        r = jnp.dot(a_ref[...] + i.astype(jnp.bfloat16), b_ref[...], preferred_element_type=jnp.float32)
        return c + r[:8, :128]
    f = make(body, a, b)
    timeit(f, a, b, tag=f"bf16 mm [1024,{K}]x[{K},256]")

# --- one-hot build + bf16 matmul (the real gather op)
for K in (512, 1024):
    idx = jnp.zeros((M, 1), jnp.int32); b = jnp.ones((K, N), jnp.bfloat16)
    def body(i, c, idx_ref, b_ref):
        kiota = lax.broadcasted_iota(jnp.int32, (M, K), 1)
        oh = (kiota == (idx_ref[...] + i)).astype(jnp.bfloat16)
        r = jnp.dot(oh, b_ref[...], preferred_element_type=jnp.float32)
        return c + r[:8, :]
    f = make(body, idx, b)
    timeit(f, idx, b, tag=f"onehot+bf16 mm K={K}")

# --- small-M matmul (compact groups): [256,K]x[K,128]
for Mg in (128, 256):
    for K in (512, 1024):
        a = jnp.ones((Mg, K), jnp.bfloat16); b = jnp.ones((K, N), jnp.bfloat16)
        def body(i, c, a_ref, b_ref):
            r = jnp.dot(a_ref[...] + i.astype(jnp.bfloat16), b_ref[...], preferred_element_type=jnp.float32)
            return c + r[:8, :]
        f = make(body, a, b)
        timeit(f, a, b, tag=f"bf16 mm [{Mg},{K}]x[{K},128]")

# --- VPU ops at [1024,128]
x = jnp.ones((M, N), jnp.int32)
def body(i, c, x_ref):
    v = x_ref[...] + i
    w = jnp.where(v > 5, v, v * 2)
    return c + w[:8, :].astype(jnp.float32)
f = make(body, x)
timeit(f, x, tag="VPU where [1024,128]")

def body(i, c, x_ref):
    v = jnp.take_along_axis(x_ref[...].astype(jnp.float32), (x_ref[...] + i) & 127, axis=1)
    return c + v[:8, :]
f = make(body, x)
timeit(f, x, tag="take_along_axis [1024,128]")

# --- rowcast: transpose + broadcast (t=8)
t8 = jnp.ones((8, 128), jnp.int32)
def body(i, c, t_ref):
    vt = (t_ref[...] + i).T
    cols = [jnp.broadcast_to(vt[:, a:a+1], (128, 128)) for a in range(8)]
    r = jnp.concatenate(cols, axis=0)
    return c + r[:8, :].astype(jnp.float32)
f = make(body, t8)
timeit(f, t8, tag="rowcast t=8 -> [1024,128]")
