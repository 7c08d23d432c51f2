"""Test configuration.

All tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the reference has no test fixtures at all —
survey §4; this is the software-backend story bitar lacked).  Pallas kernels
run in interpreter mode on CPU via the engine's ``interpret`` config knob.
"""

import os

# Force CPU: the dev environment's sitecustomize registers the axon TPU
# plugin and pins JAX_PLATFORMS=axon at interpreter start, so the env var
# alone is not enough — override through jax.config before any backend
# initializes.  Tests must be hermetic and able to fake an 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_corpus(rng, sizes=(0, 1, 7, 100, 4096, 65536, 131072, 200000)):
    """Mixed-entropy test corpus: text, random, runs, structured."""
    out = []
    for n in sizes:
        if n == 0:
            out.append(b"")
            continue
        text = (b"the quick brown fox jumps over the lazy dog %d " % n) * (n // 20 + 1)
        out.append(text[:n])
        out.append(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
        out.append(bytes(rng.integers(0, 4, n, dtype=np.uint8)))
        out.append(b"\xab" * n)
        # structured: repeating 16-byte records with a counter
        rec = np.zeros((n // 16 + 1, 16), dtype=np.uint8)
        rec[:, 0] = np.arange(rec.shape[0]) & 0xFF
        rec[:, 5] = 7
        out.append(rec.tobytes()[:n])
    return out


@pytest.fixture(scope="session")
def corpus(rng):
    return make_corpus(rng)
