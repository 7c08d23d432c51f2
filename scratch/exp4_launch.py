# Launch overhead structure: do launches pipeline? Are device-resident
# operands re-streamed per launch? How does input size affect launch cost?
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax import lax

def trivial(x_ref, o_ref):
    o_ref[...] = x_ref[0:8, :] * 2.0

small = jnp.ones((8, 128), jnp.float32)
big = jnp.ones((65536, 128), jnp.float32)   # 32 MB
f_small = pl.pallas_call(trivial, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
f_big = pl.pallas_call(trivial, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
np.asarray(f_small(small)); np.asarray(f_big(big))

def t(fn):
    t0 = time.perf_counter(); fn(); return (time.perf_counter() - t0) * 1e3

# single launch + readback
for tag, fn in (("small x1", lambda: np.asarray(f_small(small))),
                ("big(32MB dev-resident) x1", lambda: np.asarray(f_big(big)))):
    print(f"{tag}: {min(t(fn) for _ in range(4)):.1f} ms")

# N chained launches, one readback: pipelining test
def chain(n, f, x):
    def run():
        y = x
        r = None
        for _ in range(n):
            r = f(y)
        return np.asarray(r)
    return run
for n in (1, 4, 16):
    print(f"chain small x{n}: {min(t(chain(n, f_small, small)) for _ in range(3)):.1f} ms")
for n in (1, 4):
    print(f"chain big x{n}: {min(t(chain(n, f_big, big)) for _ in range(3)):.1f} ms")

# dependent chain (output feeds next launch) vs independent
def dep_chain(n):
    def run():
        y = small
        for _ in range(n):
            y = f_small(y)
        return np.asarray(y)
    return run
for n in (4, 16):
    print(f"dependent chain x{n}: {min(t(dep_chain(n)) for _ in range(3)):.1f} ms")

# host->device transfer cost (fresh numpy each time)
bignp = np.ones((8 << 20,), np.uint8)  # 8 MB
def upload():
    a = jnp.asarray(bignp)
    np.asarray(f_small(small))  # fence-ish
    return a
print(f"8MB host->device + launch: {min(t(upload) for _ in range(3)):.1f} ms")

# readback of 8 MB
dev8 = jnp.asarray(bignp)
np.asarray(dev8[:16])
def readback():
    return np.asarray(dev8)
print(f"8MB device->host readback: {min(t(readback) for _ in range(3)):.1f} ms")
