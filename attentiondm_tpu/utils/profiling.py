"""Tracing / profiling helpers.

The reference has no profiling beyond wall-clock prints (SURVEY.md §5).
Here: named trace annotations (visible in XLA/Perfetto traces), a step
timer that forces completion (device-to-host pull — plain
`block_until_ready` can return early under remote-relay transports), and a
distributed-friendly SmoothedValue (windowed metric with cross-process psum
sync — the working equivalent of the reference's dead
`SmoothedValue.synchronize_between_processes`, util.py:18-77).
"""
from __future__ import annotations

import collections
import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region for profiler traces (no-op overhead when not tracing)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Times jitted steps honestly: forces a scalar to host each lap."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def lap(self, result_ref: list | None = None):
        t0 = time.perf_counter()
        yield
        if result_ref:
            x = result_ref[0]
            if hasattr(x, "block_until_ready"):
                jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])
        self.times.append(time.perf_counter() - t0)

    @property
    def best(self):
        return min(self.times) if self.times else float("nan")

    @property
    def mean(self):
        return float(np.mean(self.times)) if self.times else float("nan")


class SmoothedValue:
    """Windowed + global average of a scalar metric, syncable across
    processes via a psum (not a dead NCCL all_reduce)."""

    def __init__(self, window_size: int = 20):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.total += float(value) * n
        self.count += n

    def synchronize_between_processes(self):
        """Sum (count, total) across all JAX processes.  No-op single-host."""
        if jax.process_count() == 1:
            return
        import jax.numpy as jnp

        vals = jnp.array([float(self.count), self.total])
        # psum over all devices, divided by local device count = per-process sum
        summed = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
            jnp.tile(vals, (jax.local_device_count(), 1))
        )[0] / jax.local_device_count()
        self.count = int(summed[0])
        self.total = float(summed[1])

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else float("nan")

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else float("nan")

    @property
    def global_avg(self):
        return self.total / max(1, self.count)
