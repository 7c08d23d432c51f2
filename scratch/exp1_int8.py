# Experiment 1: does int8 matmul lower in Pallas TPU? What's its cost vs bf16?
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import lax

print("devices:", jax.devices())

def mm_kernel_bf16(a_ref, b_ref, o_ref):
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.float32)

def mm_kernel_int8(a_ref, b_ref, o_ref):
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.int32)

M, K, N = 1024, 1024, 128
a8 = jnp.ones((M, K), jnp.int8)
b8 = jnp.ones((K, N), jnp.int8)
abf = jnp.ones((M, K), jnp.bfloat16)
bbf = jnp.ones((K, N), jnp.bfloat16)

def run(kernel, a, b, odtype, tag):
    try:
        f = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((M, N), odtype))
        r = f(a, b)
        r_np = np.asarray(r)
        print(f"{tag}: OK, out[0,0]={r_np[0,0]}")
        return True
    except Exception as e:
        print(f"{tag}: FAILED: {str(e)[:300]}")
        return False

run(mm_kernel_bf16, abf, bbf, jnp.float32, "bf16 matmul")
run(mm_kernel_int8, a8, b8, jnp.int32, "int8 matmul")

# also: int8 from a comparison (one-hot build) inside the kernel
def onehot_int8_kernel(idx_ref, b_ref, o_ref):
    kiota = lax.broadcasted_iota(jnp.int32, (M, K), 1)
    oh = (kiota == idx_ref[...]).astype(jnp.int8)
    o_ref[...] = jnp.dot(oh, b_ref[...], preferred_element_type=jnp.int32)

idx = jnp.zeros((M, K), jnp.int32)  # broadcastable index plane
try:
    f = pl.pallas_call(onehot_int8_kernel, out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))
    r = np.asarray(f(idx, b8))
    print("onehot-int8 matmul: OK", r[0, 0])
except Exception as e:
    print("onehot-int8 matmul FAILED:", str(e)[:300])
