"""Per-phase timers and latency statistics (SURVEY.md §5.1).

The reference's only instrumentation is `print(time.clock(), ...)` prepended
to control printouts (six-robot file :403) and commented-out tic/toc remnants
(casadi_test_mpc.py:164,214). Here: explicit phase timers (build / compile /
solve / step), wall-clock latency percentiles (the BASELINE p50/p99 metric),
and a block-until-ready-aware timing helper for jitted callables.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax
import numpy as np


class PhaseTimer:
    """Accumulates wall-clock per named phase; thread-unsafe by design (one
    per driver loop)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


def latency_stats(samples_s) -> dict:
    """p50/p90/p99/max of a latency sample list, in milliseconds."""
    a = np.asarray(samples_s, float) * 1e3
    if a.size == 0:
        return {}
    return {
        "p50_ms": float(np.percentile(a, 50)),
        "p90_ms": float(np.percentile(a, 90)),
        "p99_ms": float(np.percentile(a, 99)),
        "max_ms": float(a.max()),
        "mean_ms": float(a.mean()),
        "n": int(a.size),
    }


def time_fn(fn, *args, iters: int = 20, warmup: int = 2):
    """Time a jitted callable with device synchronization; returns
    (last_result, latency_stats dict)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        samples.append(time.perf_counter() - t0)
    return out, latency_stats(samples)
