"""Profiling / tracing hooks.

The reference's only timing is wall-clock deltas in a tqdm postfix
(reference denoise_train.py:35,42,60-64). TPU-native replacements:

* `trace(logdir)` — context manager around `jax.profiler` emitting a
  TensorBoard-loadable XPlane trace of every XLA computation inside.
* `StepTimer` — `block_until_ready`-accurate step timing with warmup
  discard, for windows/sec-style numbers (used by bench.py methodology).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ecg_denoise_trace") -> Iterator[None]:
    """jax.profiler trace context: `with trace('/tmp/t'): step(...)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates device-accurate step times (seconds).

    Usage:
        timer = StepTimer(warmup=2)
        for _ in range(n):
            with timer.step() as t:
                out = step_fn(...)
                t.result = out      # block_until_ready target
        timer.mean()  # seconds/step over post-warmup steps
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        class _Holder:
            result: Optional[Any] = None

        holder = _Holder()
        t0 = time.perf_counter()
        yield holder
        if holder.result is not None:
            jax.block_until_ready(holder.result)
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
