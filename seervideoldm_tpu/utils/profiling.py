"""Tracing / profiling hooks (SURVEY §5: the reference has none — only tqdm
bars).  Thin wrappers over ``jax.profiler`` plus wall-clock step timers and
an optional NaN checker, so perf work is measurable from any entry point.

Usage::

    with trace("outputs/trace"):          # XLA/TPU profile, view in tensorboard
        run_steps()

    timer = StepTimer()
    for batch in loader:
        with timer:
            state, m = train_step(state, batch, rng)
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile (HLO timelines) into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region visible in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timer with percentile summary.

    Blocks on device completion at exit of each region so timings are real:
    a fresh scalar computation is enqueued behind the region's work on the
    default device and fetched to host — TPU/CPU streams execute in order,
    so the fetch returns only once everything dispatched inside the region
    has finished.  (``jax.effects_barrier()`` is NOT enough: it waits only
    on effect runtime tokens, and a pure jitted step has none — it would
    time async dispatch, not the step.)  A small scalar fetch is also the
    relay-safe sync (bulk transfers ride a slow tunnel)."""

    def __init__(self, skip_first: int = 1):
        self.times: list[float] = []
        self.skip_first = skip_first
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        import jax
        import jax.numpy as jnp

        # in-order queue drain (see docstring) on EVERY local device: a
        # scalar on the default device alone would not wait for the other
        # chips of a sharded step
        for d in jax.local_devices():
            float(jax.device_put(jnp.zeros(()), d) + 0.0)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        times = np.asarray(self.times[self.skip_first :] or self.times)
        return {
            "steps": len(self.times),
            "mean_s": float(times.mean()),
            "p50_s": float(np.percentile(times, 50)),
            "p95_s": float(np.percentile(times, 95)),
        }


def enable_nan_checks() -> None:
    """Debug mode: raise on any NaN produced under jit (slow; dev only)."""
    jax.config.update("jax_debug_nans", True)


def disable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", False)
