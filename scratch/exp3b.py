import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax import lax

LO, HI = 64, 512
M, N = 1024, 128

def bench(body_fn, args, tag):
    def build(iters):
        def kern(*refs):
            in_refs, o_ref = refs[:-1], refs[-1]
            acc = lax.fori_loop(0, iters, lambda i, c: body_fn(i, c, *in_refs),
                                jnp.zeros((8, 128), jnp.float32))
            o_ref[...] = acc
        return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    try:
        flo, fhi = build(LO), build(HI)
        np.asarray(flo(*args)); np.asarray(fhi(*args))
        tlo = min(tval(flo, args) for _ in range(3))
        thi = min(tval(fhi, args) for _ in range(3))
        per = (thi - tlo) / (HI - LO)
        print(f"{tag}: {per*1e6:.2f} us/iter  (lo={tlo*1e3:.1f}ms hi={thi*1e3:.1f}ms)")
    except Exception as e:
        print(f"{tag}: FAILED {str(e)[:150]}")

def tval(f, args):
    t0 = time.perf_counter(); np.asarray(f(*args)); return time.perf_counter() - t0

# full gather op: onehot(idx+i) @ plane — bf16 vs int8, K x N variants
idx = jnp.zeros((M, 1), jnp.int32)
for K in (512, 1024, 2048):
    for NN in (128, 256):
        b = jnp.ones((K, NN), jnp.bfloat16)
        def body(i, c, idx_ref, b_ref):
            kiota = lax.broadcasted_iota(jnp.int32, (M, K), 1)
            oh = (kiota == (idx_ref[...] + i)).astype(jnp.bfloat16)
            r = jnp.dot(oh, b_ref[...], preferred_element_type=jnp.float32)
            return c + r[:8, :128]
        bench(body, (idx, b), f"gather bf16 K={K} N={NN}")

for K in (512, 1024, 2048):
    for NN in (128, 256):
        b = jnp.ones((K, NN), jnp.int8)
        def body(i, c, idx_ref, b_ref):
            kiota = lax.broadcasted_iota(jnp.int32, (M, K), 1)
            oh = (kiota == (idx_ref[...] + i)).astype(jnp.int8)
            r = jnp.dot(oh, b_ref[...], preferred_element_type=jnp.int32)
            return c + r[:8, :128].astype(jnp.float32)
        bench(body, (idx, b), f"gather int8 K={K} N={NN}")

# compact-group gather: M=256 cells
idx2 = jnp.zeros((256, 1), jnp.int32)
for K in (512, 1024):
    b = jnp.ones((K, 256), jnp.bfloat16)
    def body(i, c, idx_ref, b_ref):
        kiota = lax.broadcasted_iota(jnp.int32, (256, K), 1)
        oh = (kiota == (idx_ref[...] + i)).astype(jnp.bfloat16)
        r = jnp.dot(oh, b_ref[...], preferred_element_type=jnp.float32)
        return c + r[:8, :128]
    bench(body, (idx2, b), f"gather bf16 M=256 K={K} N=256")

# scatter: [1024,256]x[256,128]
sc = jnp.zeros((1024, 1), jnp.int32)
for Mg in (128, 1024):
    b = jnp.ones((256, 128), jnp.bfloat16)
    def body(i, c, s_ref, b_ref):
        kiota = lax.broadcasted_iota(jnp.int32, (Mg, 256), 1)
        oh = (kiota == (s_ref[:Mg, :] + i)).astype(jnp.bfloat16)
        r = jnp.dot(oh, b_ref[...], preferred_element_type=jnp.float32)
        return c + r[:8, :]
    bench(body, (sc, b), f"scatter onehot [{Mg},256]x[256,128]")

# VPU ops
x = jnp.ones((M, N), jnp.int32)
def body(i, c, x_ref):
    v = x_ref[...] + i
    w = jnp.where(v > 5, v, v * 2)
    return c + w[:8, :].astype(jnp.float32)
bench(body, (x,), "VPU add+where [1024,128]")

def body(i, c, x_ref):
    v = jnp.take_along_axis(x_ref[...].astype(jnp.float32), (x_ref[...] + i) & 127, axis=1)
    return c + v[:8, :]
bench(body, (x,), "take_along_axis [1024,128]")

t8 = jnp.ones((8, 128), jnp.int32)
def body(i, c, t_ref):
    vt = (t_ref[...] + i).T
    cols = [jnp.broadcast_to(vt[:, a:a+1], (128, 128)) for a in range(8)]
    r = jnp.concatenate(cols, axis=0)
    return c + r[:8, :].astype(jnp.float32)
bench(body, (t8,), "rowcast t=8")

def body(i, c, t_ref):
    vt = (t_ref[...] + i).T
    cols = [jnp.broadcast_to(vt[:, a:a+1], (128, 128)) for a in range(2)]
    r = jnp.concatenate(cols, axis=0)
    return c + r[:8, :].astype(jnp.float32)
bench(body, (t8,), "rowcast t=2")

# min-reduce over lanes [1024,128] (row_a computation)
def body(i, c, x_ref):
    v = jnp.min(x_ref[...] + i, axis=1, keepdims=True)
    return c + jnp.broadcast_to(v[:8, :], (8, 128)).astype(jnp.float32)
bench(body, (x,), "min-reduce lanes [1024,128]")
