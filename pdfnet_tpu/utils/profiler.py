"""Profiling / tracing hooks.

The reference has no profiling subsystem beyond wall-clock AverageMeters
(lib/trains/base_trainer.py:116-121, batch_time/data_time + progress-bar
ETA).  The TPU-native rebuild provides both:

- the same wall-clock meters (data-wait vs step time), and
- ``jax.profiler`` device traces over a step window, viewable in
  TensorBoard / Perfetto (trace_dir/plugins/profile/...).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

from pdfnet_tpu.utils.vis import AverageMeter


class StepProfiler:
    """Per-step timing meters + an optional jax.profiler trace window.

    Usage::

        prof = StepProfiler(trace_dir="outputs/profile", start_step=10,
                            num_steps=5)
        for batch in data:
            prof.data_tick()           # after the batch is ready
            with prof.step():          # wraps the device step
                state, stats = train_step(...)
        prof.close()                   # stops a still-open trace

    Attribution caveat: under JAX async dispatch, step() measures only the
    host-side dispatch unless the caller blocks inside the window (e.g.
    ``jax.block_until_ready(stats)``) — otherwise device time surfaces at
    the next host sync and lands in data_time.  The trainer does this when
    ``Config.profile_sync`` is set (also implied by an active trace window,
    where exact step boundaries matter); with it off, the meters measure
    pipeline gaps, which is what the async production loop cares about.
    """

    def __init__(self, trace_dir: str = "", start_step: int = 10,
                 num_steps: int = 5):
        self.trace_dir = trace_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self.step_num = 0
        self.tracing = False
        self.batch_time = AverageMeter()
        self.data_time = AverageMeter()
        self._last = time.perf_counter()

    def reset_epoch(self) -> None:
        """Reset the wall-clock meters at an epoch boundary so compilation /
        init time before the first step is not charged to data_time and the
        summary reflects only the current epoch."""
        self.batch_time.reset()
        self.data_time.reset()
        self._last = time.perf_counter()

    def data_tick(self) -> None:
        """Call when the host batch is ready: accumulates data-wait time."""
        now = time.perf_counter()
        self.data_time.update(now - self._last)
        self._last = now

    @contextlib.contextmanager
    def step(self):
        """Wrap one train step: StepTraceAnnotation + trace window edges."""
        if self.trace_dir and not self.tracing \
                and self.step_num == self.start_step:
            jax.profiler.start_trace(self.trace_dir)
            self.tracing = True
        ann = jax.profiler.StepTraceAnnotation("train", step_num=self.step_num)
        t0 = time.perf_counter()
        with ann:
            yield
        now = time.perf_counter()
        self.batch_time.update(now - t0)
        self._last = now
        self.step_num += 1
        if self.tracing and self.step_num >= self.stop_step:
            jax.profiler.stop_trace()
            self.tracing = False

    def close(self) -> None:
        if self.tracing:
            jax.profiler.stop_trace()
            self.tracing = False

    def summary(self) -> Dict[str, float]:
        return {
            "data_time_avg_s": self.data_time.avg,
            "step_time_avg_s": self.batch_time.avg,
        }
