"""A/B the dense_q batching knob on the markdown-text corpus (silicon).

Usage: python scratch/dense_q_ab.py [nblocks] [q1,q2,...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B                                     # corpus builders
import bitar_tpu as bt


def main():
    nblocks = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    # configs: "q:sub,q:sub,..."
    combos = ([tuple(int(v) for v in x.split(":")) for x in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [(1, 1024), (4, 256), (4, 128)])
    data = B.make_text_corpus(nblocks)
    reps = 8
    for q, sub in combos:
        cfg = bt.EngineConfig(
            codec=bt.Codec.LZ4, block_size=B.BLOCK, burst_size=nblocks,
            max_pool_slots=max(64, nblocks + 32), commit="deferred",
            dense_q=q, dense_sub=sub)
        eng = bt.Engine(cfg).initialize()
        unit = eng.compress(data)
        eng.ensure_plans(unit)
        assert eng.decompress(unit).tobytes() == data, \
            f"round-trip broken at q={q} sub={sub}"
        launch = eng.prepare_device_decode(unit)
        np.asarray(launch()[0, 0, :1])                # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(reps):
                last = launch()
            np.asarray(last[0, 0, :1])
            best = min(best, (time.perf_counter() - t0) / reps)
        gbps = len(data) / best / 1e9
        pf = unit.plan_flat
        print(f"dense_q={q} sub={sub}: {best*1e3:.2f} ms/launch  {gbps:.3f} GB/s  "
              f"(passes {int(pf['p_used'].sum())}, dense "
              f"{int(np.maximum(pf['dense'], 0).sum())})", flush=True)
        eng.recycle(unit)
        eng.release()


if __name__ == "__main__":
    sys.exit(main())
