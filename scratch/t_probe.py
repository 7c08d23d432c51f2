import sys, time
t0=time.time()
import jax
print(f"import {time.time()-t0:.1f}s", flush=True)
t0=time.time()
d = jax.devices()
print(f"devices {time.time()-t0:.1f}s: {d}", flush=True)
import numpy as np
x = jax.device_put(np.ones(8, np.float32))
print("sum:", float(x.sum()), flush=True)
