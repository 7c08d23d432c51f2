# Slope-based per-op timing: t(ITERS=hi) - t(ITERS=lo) removes launch overhead.
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
    flo, fhi = build(LO), build(HI)
    np.asarray(flo(*args)); np.asarray(fhi(*args))  # compile
    tlo = min(tval(flo, args) for _ in range(3))
    thi = min(tval(fhi, args) for _ in range(3))
    per = (thi - tlo) / (HI - LO)
    print(f"{tag}: {per*1e6:.2f} us/iter  (lo={tlo*1e3:.1f}ms hi={thi*1e3:.1f}ms)")

def tval(f, args):
    t0 = time.perf_counter(); np.asarray(f(*args)); return time.perf_counter() - t0

# gather matmuls bf16 vs int8
for K in (512, 1024, 2048):
    a = jnp.ones((M, K), jnp.bfloat16); b = jnp.ones((K, N), jnp.bfloat16)
    def body(i, c, a_ref, b_ref):
        r = jnp.dot(a_ref[...] + i.astype(jnp.bfloat16), b_ref[...], preferred_element_type=jnp.float32)
        return c + r[:8, :]
    bench(body, (a, b), f"bf16 mm [1024,{K}]x[{K},128]")

for K in (512, 1024, 2048):
    a = jnp.ones((M, K), jnp.int8); b = jnp.ones((K, N), jnp.int8)
    def body(i, c, a_ref, b_ref):
        r = jnp.dot(a_ref[...] * (i & 1).astype(jnp.int8), b_ref[...], preferred_element_type=jnp.int32)
        return c + r[:8, :].astype(jnp.float32)
    bench(body, (a, b), f"int8 mm [1024,{K}]x[{K},128]")

# onehot build only (VPU)
for K in (512, 1024):
    idx = jnp.zeros((M, 1), jnp.int32)
    def body(i, c, idx_ref):
        kiota = lax.broadcasted_iota(jnp.int32, (M, K), 1)
        oh = (kiota == (idx_ref[...] + i)).astype(jnp.bfloat16)
        return c + oh[:8, :128].astype(jnp.float32)
    bench(body, (idx,), f"onehot build [1024,{K}]")

# compact-group shapes
for Mg in (256,):
    for K in (512, 1024):
        a = jnp.ones((Mg, K), jnp.bfloat16); b = jnp.ones((K, N), jnp.bfloat16)
        def body(i, c, a_ref, b_ref):
            r = jnp.dot(a_ref[...] + i.astype(jnp.bfloat16), b_ref[...], preferred_element_type=jnp.float32)
            return c + r[:8, :]
        bench(body, (a, b), f"bf16 mm [{Mg},{K}]x[{K},128]")

# VPU suite at [1024,128]
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

t2 = jnp.ones((2, 128), jnp.int32)
def body(i, c, t_ref):
    vt = (t_ref[...] + i).T
    cols = [jnp.broadcast_to(vt[:, a:a+1], (128, 128)) for a in range(2)]
    r = jnp.concatenate(cols, axis=0)
    return c + r[:8, :].astype(jnp.float32)
bench(body, (t2,), "rowcast t=2")
