"""Tracing / profiling helpers (aux subsystem; the reference has none
first-party — SURVEY.md §5 — only HF Trainer tensorboard hooks).

Wraps jax.profiler for device traces viewable in Perfetto/TensorBoard, plus a
simple device-time step timer that works on relay-attached chips where
``block_until_ready`` is unreliable (forces a scalar fetch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with profiling.trace("/tmp/trace"): step(...)``.
    View with TensorBoard's profile plugin or ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)


def device_time(fn, *args, iters: int = 1, chain: int = 1, feedback=None, **kwargs) -> float:
    """Seconds per call, measured with a forced scalar fetch.

    ``chain`` repeats the op inside one jitted program with a data dependency
    (defeats CSE) to amortize host↔device sync — required on tunneled chips
    where per-program round-trips dominate single-call timings.

    The default dependency adds eps to every input between steps, which costs
    a full read+write of the inputs per step — fine when fn dominates, but it
    inflates fast ops with big inputs (e.g. attention over 160MB of q/k/v
    costs ~2ms/step of extra HBM traffic at 159GB/s). For honest kernel
    comparisons pass ``feedback(out, args) -> args`` routing the output back
    into the inputs (zero extra traffic), e.g. ``lambda o, a: (o,) + a[1:]``.
    """

    def prog(*a, **kw):
        acc = jnp.float32(0)
        for i in range(chain):
            out = fn(*a, **kw)
            acc = acc + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
            if feedback is not None:
                a = feedback(out, a)
            else:
                a = jax.tree.map(lambda x: x + jnp.asarray(1e-6, x.dtype) if hasattr(x, "dtype") else x, a)
        return acc

    p = jax.jit(prog)
    float(p(*args, **kwargs))  # compile + warm
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += float(p(*args, **kwargs))
    return (time.perf_counter() - t0) / (iters * chain)


class StepTimer:
    """Rolling it/s + device-step seconds for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._times = self._times[-self.window:]
        self._last = now
        return self.rate

    @property
    def rate(self) -> Optional[float]:
        if not self._times:
            return None
        return len(self._times) / sum(self._times)
