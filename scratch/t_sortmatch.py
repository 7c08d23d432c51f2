import sys, os, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

L = 131072   # 128 KiB block positions

@jax.jit
def match_hints(blocks_u8):
    """[N, L] uint8 -> (cand_off int32 [N, L]) via sorted 4-byte values.
    cand_off[p] = p - q for the most recent q < p with the same 4 bytes
    (0 = none)."""
    b = blocks_u8.astype(jnp.uint32)
    v = (b
         | (jnp.roll(b, -1, axis=1) << 8)
         | (jnp.roll(b, -2, axis=1) << 16)
         | (jnp.roll(b, -3, axis=1) << 24))
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), v.shape)
    sv, sp = lax.sort((v, pos), dimension=1, num_keys=2)
    same = jnp.concatenate(
        [jnp.zeros((v.shape[0], 1), bool), sv[:, 1:] == sv[:, :-1]], axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((v.shape[0], 1), jnp.int32), sp[:, :-1]], axis=1)
    off = jnp.where(same, sp - prev, 0)
    # scatter back to position order: out[sp] = off
    out = jnp.zeros_like(off)
    out = jax.vmap(lambda o, p, x: o.at[p].set(x))(out, sp, off)
    return out

rng = np.random.default_rng(0)
text = (b"the quick brown fox jumped over the lazy dogs 01234 " * 3000)[:L]
blocks = np.stack([np.frombuffer(text, np.uint8),
                   rng.integers(0, 16, L, np.uint8),
                   rng.integers(0, 256, L, np.uint8),
                   np.full(L, 7, np.uint8)] * 2)
x = jnp.asarray(blocks)
r = match_hints(x)
h = np.asarray(r)
# sanity: text positions should mostly have candidates
print("cand coverage text:", (h[0] > 0).mean().round(3),
      "lowent:", (h[1] > 0).mean().round(3),
      "random:", (h[2] > 0).mean().round(3), "rle:", (h[3] > 0).mean().round(3))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(8):
        r = match_hints(x)
    np.asarray(r[:, -1])
    best = min(best, (time.perf_counter() - t0) / 8)
n = blocks.shape[0]
print(f"{best*1e3:.2f} ms for {n} blocks = {best*1e3/n:.2f} ms/block "
      f"({n*L/best/1e9:.2f} GB/s match throughput)")
