"""Fused device-compress pipeline cost at several batch sizes."""
import sys, time, functools
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from bitar_tpu.ops import device_compress as dc
from bitar_tpu.ops.cpu import native

BLOCK = 128 * 1024

def corpus(n):
    rng = np.random.default_rng(2026)
    planes = np.zeros((n, BLOCK), np.uint8)
    for i in range(n):
        k = i % 4
        if k == 0:
            p = ((b"The quick brown fox jumps over the lazy dog %d. " % i) * (BLOCK // 47 + 1))[:BLOCK]
        elif k == 1:
            p = rng.integers(0, 16, BLOCK, dtype=np.uint8).tobytes()
        elif k == 2:
            p = rng.integers(0, 256, BLOCK, dtype=np.uint8).tobytes()
        else:
            p = bytes([i & 0xFF]) * BLOCK
        planes[i] = np.frombuffer(p, np.uint8)
    return planes

@functools.partial(jax.jit, static_argnames=("seg", "min_match", "out_width", "length"))
def fused(planes, lengths, *, seg, min_match, out_width, length):
    from bitar_tpu.ops.pallas.lz4_match_dyn import detect_offsets, find_matches_dyn
    n, L = planes.shape
    nrows = L // 128
    offs, _ = detect_offsets(planes, max_off=min(0xFFFF, L - 128))
    noff = (offs > 0).sum(axis=1).astype(jnp.int32)
    mlen, moff = find_matches_dyn(planes.reshape(n, nrows, 128), noff, offs,
                                  nrows=nrows, max_match=min(seg, 512))
    layout = dc.parse_and_size(mlen.reshape(n, L), moff.reshape(n, L),
                               lengths, seg=seg, min_match=min_match, length=L)
    out = dc.materialize(planes, layout, out_width=out_width)
    return out, layout["total"]

for N in (64, 128, 256):
    planes = corpus(N)
    dpl = jax.device_put(jnp.asarray(planes))
    dlen = jax.device_put(jnp.full(N, BLOCK, np.int32))
    t0 = time.perf_counter()
    out, sizes = fused(dpl, dlen, seg=512, min_match=6, out_width=4096, length=BLOCK)
    szs = np.asarray(sizes)
    print(f"N={N}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    if N == 64:
        host = np.asarray(out)
        ok = bad = 0
        raw_total = comp_total = 0
        for i in range(N):
            raw_total += BLOCK
            if szs[i] >= BLOCK or szs[i] > 4096:
                comp_total += BLOCK
                continue
            dec = np.asarray(native.lz4_decompress(host[i, :szs[i]], BLOCK))
            comp_total += int(szs[i])
            if dec.tobytes() == planes[i].tobytes(): ok += 1
            else: bad += 1
        print(f"  verify: ok={ok} bad={bad} ratio={raw_total/comp_total:.3f}", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            r = fused(dpl, dlen, seg=512, min_match=6, out_width=4096, length=BLOCK)
        np.asarray(r[0].reshape(-1)[:1]); np.asarray(r[1][:1])
        best = min(best, (time.perf_counter()-t0)/4)
    print(f"  fused pipeline: {best*1e3:7.2f} ms  ({N*BLOCK/best/1e9:.3f} GB/s)", flush=True)
