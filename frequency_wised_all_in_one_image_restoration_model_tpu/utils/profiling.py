"""Tracing / profiling utilities.

The reference has no profiling at all — only an unused wall-clock ``timer``
(val_utils.py:76-97). Here (SURVEY.md §5.1 plan): a steady-state timing
harness, a megapixels/sec throughput meter (the north-star metric), and
``jax.profiler`` trace capture for in-depth XLA analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


class Timer:
    """Accumulating wall-clock timer (reference val_utils.py:76-97 surface)."""

    def __init__(self):
        self.acc = 0.0
        self.tic()

    def tic(self):
        self.t0 = time.perf_counter()

    def toc(self) -> float:
        return time.perf_counter() - self.t0

    def hold(self):
        self.acc += self.toc()

    def release(self) -> float:
        ret = self.acc
        self.acc = 0.0
        return ret

    def reset(self):
        self.acc = 0.0


def steady_state_time(fn: Callable, *args, iters: int = 20,
                      warmup: int = 2) -> float:
    """Median-free steady-state seconds/call of a jitted fn (device-synced)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def throughput_mps(fn: Callable, *args, batch: int, patch: int,
                   iters: int = 20) -> float:
    """Restored megapixels/sec of an image-restoration forward."""
    sec = steady_state_time(fn, *args, iters=iters)
    return batch * patch * patch / sec / 1e6


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepMeter:
    """Per-step training throughput meter: steps/sec + samples/sec +
    MP/s, with periodic reporting."""

    def __init__(self, batch: int, patch: int, every: int = 50):
        self.batch = batch
        self.patch = patch
        self.every = every
        self.n = 0
        self.t0 = time.perf_counter()

    def step(self) -> Optional[Dict[str, float]]:
        self.n += 1
        if self.n % self.every:
            return None
        dt = time.perf_counter() - self.t0
        stats = {
            "steps_per_sec": self.every / dt,
            "samples_per_sec": self.every * self.batch / dt,
            "train_mps": self.every * self.batch * self.patch ** 2 / dt / 1e6,
        }
        self.t0 = time.perf_counter()
        return stats
