"""Profiling hooks.

The reference has no tracer — only inline TSC timestamps printed per phase
(``demo_app.cc:82-89``).  Here: the same per-phase GB/s UX (utils.timing)
plus real tracing via ``jax.profiler`` for device timelines, gated behind
an env var / context manager so production paths pay nothing.
"""

from __future__ import annotations

import contextlib
import os
import time

from .logging import get_logger

logger = get_logger("utils.profiling")


@contextlib.contextmanager
def device_trace(log_dir: str | None = None):
    """Capture a jax.profiler trace around a region.

    Enable by passing ``log_dir`` or setting BITAR_TPU_TRACE_DIR; view
    with TensorBoard's profile plugin or xprof."""
    log_dir = log_dir or os.environ.get("BITAR_TPU_TRACE_DIR")
    if not log_dir:
        yield None
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir
    logger.info("device trace written to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (TraceAnnotation) + wall log."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    logger.debug("%s: %.3f ms", name, (time.perf_counter() - t0) * 1e3)
