import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np, jax, jax.numpy as jnp

dev = jax.devices()[0]
for mb in (1, 8, 32, 64):
    a = np.random.default_rng(0).integers(0, 256, mb << 20, np.uint8)
    x = jax.device_put(a, dev); x.block_until_ready()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = jax.device_put(a, dev); x.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"upload {mb:3d} MiB: {best*1e3:8.1f} ms  ({mb/1024/best:.3f} GB/s)")
    # download
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(x)
        best = min(best, time.perf_counter() - t0)
    print(f"  down {mb:3d} MiB: {best*1e3:8.1f} ms  ({mb/1024/best:.3f} GB/s)")
