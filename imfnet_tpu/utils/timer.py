"""Wall-clock meters behind the reference API (`lib/timer.py:5-72`), plus a
jax.profiler hook for device traces (aux subsystem, SURVEY.md §5)."""
from __future__ import annotations

import contextlib
import time


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        self.sq_sum += val**2 * n
        self.var = self.sq_sum / self.count - self.avg**2


class Timer:
    def __init__(self, binary_fn=None, init_val=0.0):
        self.total_time = init_val
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.binary_fn = binary_fn
        self.tmp = init_val

    @property
    def avg(self):
        return self.total_time / max(self.calls, 1)

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average=True):
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        if self.binary_fn:
            self.tmp = self.binary_fn(self.tmp, self.diff)
        return self.avg if average else self.diff


class MinTimer(Timer):
    def __init__(self):
        super().__init__(binary_fn=min, init_val=float("inf"))

    @property
    def min(self):
        return self.tmp


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (replaces the reference's absent profiler)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
