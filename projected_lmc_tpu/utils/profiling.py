"""Tracing / profiling helpers.

The reference measures wall-clock only (train_time/pred_time/t_per_iter,
experiments.py:261,284,316,331). Those metric names are preserved by
training.fit and metrics.compute_metrics; this module adds optional
jax.profiler traces (TensorBoard-viewable) around any region.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax-trace", enabled: bool = True):
    """jax.profiler trace context; no-op when disabled."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer mirroring the reference's time.time() bracketing."""

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.start
        return False
