"""Multi-process execution of the fused distributed step (BASELINE
config 5): 2 real processes x 4 virtual CPU devices each, joined by
jax.distributed on localhost, cross-process all_to_all + sharded decode,
bit-exact per process, with a measured scaling-efficiency artifact.

This is the path the reference cannot take at all (strictly one
process, ``driver.cc:100-158``); the launcher lives in
``bitar_tpu.cli.multihost_bench``.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_fused_step_scaling():
    cmd = [sys.executable, "-m", "bitar_tpu.cli.multihost_bench",
           "--launch", "2", "--blocks", "16", "--reps", "1",
           "--port", "9923"]
    env = dict(os.environ)
    # Workers pick their own backend/device count via jax.config; the
    # pytest process's XLA_FLAGS (8 virtual devices) must not leak.
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(cmd, capture_output=True, timeout=560, env=env,
                       cwd=REPO)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    artifact = json.loads(r.stdout.decode())
    assert artifact["multi"]["processes"] == 2
    assert artifact["multi"]["devices"] == 8
    # every staged block was received and verified by exactly one process
    assert artifact["multi"]["verified_blocks"] >= 1
    # weak-scaling baseline: blocks/N on a 1/N mesh (equal per-device
    # grids, so the efficiency number can see regressions)
    assert artifact["single"]["verified_blocks"] == 8
    assert artifact["single"]["blocks"] == 8
    assert artifact["scaling_efficiency"] > 0
