import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl

def trivial(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0

small = jnp.ones((8, 128), jnp.float32)
big = jnp.ones((65536, 128), jnp.float32)   # 32 MB
spec8 = pl.BlockSpec((8, 128), lambda i: (0, 0))
f_small = pl.pallas_call(trivial, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                         in_specs=[spec8], out_specs=spec8, grid=(1,))
np.asarray(f_small(small)); np.asarray(f_small(big[:8]))

def t(fn):
    t0 = time.perf_counter(); fn(); return (time.perf_counter() - t0) * 1e3

print(f"small x1: {min(t(lambda: np.asarray(f_small(small))) for _ in range(4)):.1f} ms")
# big operand but kernel reads only 8 rows: is the whole 32MB re-streamed?
fb = pl.pallas_call(trivial, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))], out_specs=spec8, grid=(1,))
np.asarray(fb(big))
print(f"big-operand(32MB, 8-row read) x1: {min(t(lambda: np.asarray(fb(big))) for _ in range(4)):.1f} ms")

def chain(n, f, x):
    def run():
        r = x
        out = None
        for _ in range(n):
            out = f(r)
        return np.asarray(out)
    return run
for n in (1, 4, 16):
    print(f"chain small x{n}: {min(t(chain(n, f_small, small)) for _ in range(3)):.1f} ms")
for n in (1, 4):
    print(f"chain big-operand x{n}: {min(t(chain(n, fb, big)) for _ in range(3)):.1f} ms")

def dep_chain(n):
    def run():
        y = small
        for _ in range(n):
            y = f_small(y)
        return np.asarray(y)
    return run
for n in (4, 16):
    print(f"dependent chain x{n}: {min(t(dep_chain(n)) for _ in range(3)):.1f} ms")

bignp = np.ones((8 << 20,), np.uint8)
def upload():
    a = jax.device_put(bignp)
    a.block_until_ready()
    return a
print(f"8MB host->device (block_until_ready): {min(t(upload) for _ in range(3)):.1f} ms")

dev8 = jax.device_put(bignp); np.asarray(dev8[:16])
print(f"8MB device->host readback: {min(t(lambda: np.asarray(dev8)) for _ in range(3)):.1f} ms")
print(f"tiny readback of dev array: {min(t(lambda: np.asarray(dev8[:128])) for _ in range(3)):.1f} ms")
