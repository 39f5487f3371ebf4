"""Per-pass profiling and tracing.

Role of the reference's three cooperating profilers (SURVEY.md section 5):
puffin CPU scopes, gpu-profiler timestamp queries per rg pass, and Vulkan
debug labels. TPU equivalents:
  * `pass_scope` — `jax.profiler.TraceAnnotation` + named_scope so every
    pass shows up in xplane/tensorboard traces and in XLA HLO module names;
  * `FrameTimer` — host-side wall-clock per-frame stats with the same
    10-frame smoothing the reference's main loop uses (`main_loop.rs:398`);
  * `time_passes` — a coarse per-pass ms table like `gi-overview.md:452`
    obtained by running each pass jitted+blocked in isolation.
"""
from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


@contextlib.contextmanager
def pass_scope(name: str):
    """Annotate a pass for the profiler + HLO naming."""
    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name):
            yield


class FrameTimer:
    """dt filter over the last N frames (`main_loop.rs:398-420`)."""

    def __init__(self, window: int = 10):
        self.samples = deque(maxlen=window)
        self._last = None

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            self.samples.append(now - self._last)
        self._last = now
        return self.dt

    @property
    def dt(self) -> float:
        if not self.samples:
            return 1.0 / 60.0
        return sum(self.samples) / len(self.samples)

    @property
    def fps(self) -> float:
        return 1.0 / max(self.dt, 1e-9)


def time_jitted(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall ms of a jitted callable (blocks on all outputs)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]


def start_trace(logdir: str):
    """Begin an xplane trace (viewable in tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()
