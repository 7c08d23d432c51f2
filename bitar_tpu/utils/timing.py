"""Benchmark timing helpers.

The reference measures with raw TSC reads converted to microseconds and
Gbps (``PrintPerfNumbers``, ``apps/demo_app.cc:82-89``; 3 runs per phase,
``demo_app.h:45``).  Here: monotonic perf counters with an explicit
``block_until_ready`` join so JAX async dispatch cannot fake a result, and
the same duration+throughput reporting UX.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax

NUM_BENCH_RUNS = 3  # reference kNumTests (demo_app.h:45)


@dataclass
class PhaseTiming:
    name: str
    bytes_processed: int
    seconds: list[float] = field(default_factory=list)

    @property
    def best(self) -> float:
        return min(self.seconds) if self.seconds else float("inf")

    @property
    def mean(self) -> float:
        return sum(self.seconds) / len(self.seconds) if self.seconds else float("inf")

    def gbps(self, which: str = "best") -> float:
        """Throughput in gigabytes/second (decimal GB, like the reference's
        Gbps print normalized to bytes)."""
        secs = self.best if which == "best" else self.mean
        if secs <= 0:
            return 0.0
        return self.bytes_processed / secs / 1e9

    def report(self) -> str:
        us = [f"{s * 1e6:,.0f}" for s in self.seconds]
        return (f"{self.name}: runs(us)=[{', '.join(us)}] best={self.best * 1e6:,.0f}us "
                f"throughput={self.gbps():.3f} GB/s over {self.bytes_processed:,} bytes")


def time_phase(name: str, bytes_processed: int, fn, runs: int = NUM_BENCH_RUNS,
               sync: bool = True) -> PhaseTiming:
    """Run ``fn`` ``runs`` times, timing each (first run may include compile).

    ``fn`` may return jax arrays (or pytrees of them); when ``sync`` they are
    blocked on before the clock stops — the `block_until_ready` analog of the
    reference's callback-timestamped async window (``demo_app.cc:376``).
    """
    timing = PhaseTiming(name=name, bytes_processed=bytes_processed)
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        if sync and out is not None:
            jax.block_until_ready(out)
        timing.seconds.append(time.perf_counter() - t0)
    return timing
