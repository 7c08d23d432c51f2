#!/bin/bash
# Run after the TPU tunnel recovers (/tmp/tpu_probe.log shows SUCCESS).
# ONE python at a time (single TPU claim).  Expect Mosaic recompiles
# (20-300 s per new kernel shape) on the first run of each step.
set -x
cd /root/repo

# 1. Compile-check the dense-wire kernel via the graft entry.
timeout 900 python -c "
import __graft_entry__ as g, jax, numpy as np
fn, args = g.entry()
out = np.asarray(jax.jit(fn)(*args))
print('entry compile+run OK', out.shape)
" > scratch/rec_entry.log 2>&1 || exit 1

# 2. Headline bench (256-block launches, the known-good shape).
timeout 2400 python bench.py > scratch/rec_bench_256.log 2>&1
tail -2 scratch/rec_bench_256.log

# 3. Launch-amortization probe: 512-block launches.
BENCH_NBLOCKS=512 timeout 2400 python bench.py > scratch/rec_bench_512.log 2>&1
tail -2 scratch/rec_bench_512.log

# 4. BASELINE configs 1-3 + skewed (config 4).
timeout 3600 python -m bitar_tpu.cli.configs_bench --out CONFIGS_r02.json \
    > scratch/rec_configs.log 2>&1
timeout 1800 python -m bitar_tpu.cli.demo --mode skewed --codec lz4 \
    > scratch/rec_skewed.log 2>&1
tail -3 scratch/rec_configs.log scratch/rec_skewed.log
