import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k1(x_ref, o_ref):
    o_ref[...] = jnp.roll(x_ref[...], -1, axis=0)
def k2(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], -1, 0)

x = jnp.arange(32*128, dtype=jnp.int8).reshape(32, 128)
for tag, k in (("jnp.roll", k1), ("pltpu.roll", k2)):
    try:
        f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int8))
        r = np.asarray(f(x))
        ok = (r == np.roll(np.asarray(x), -1, axis=0)).all()
        print(tag, "OK" if ok else "WRONG")
    except Exception as e:
        print(tag, "FAILED:", str(e)[:150])
