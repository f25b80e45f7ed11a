"""Structured per-step metrics: CSV + stdout (replaces TensorBoard writer +
the reference's unused MetricLogger/AverageMeter, util.py:80-159,
utils/compute.py:70-92)."""
from __future__ import annotations

import csv
import os
import time


class AverageMeter:
    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(1, self.count)


class MetricsLogger:
    """Append-only CSV of (step, wall_time, **metrics); echoes to logging."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fields = None
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        row = {"step": step, "wall_s": round(time.time() - self._t0, 3), **metrics}
        write_header = self._fields is None
        if write_header:
            self._fields = list(row.keys())
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields, extrasaction="ignore")
            if write_header and f.tell() == 0:
                w.writeheader()
            w.writerow(row)


def log_every(iterable, print_freq: int, header: str = "", logger=None):
    """Progress-logging iterator wrapper: iter/s, ETA, and (single-chip) live
    device-memory stats when available — the working equivalent of the
    reference's MetricLogger.log_every (util.py:115-159, which reported
    torch.cuda.max_memory_allocated and was never called)."""
    import logging as _logging
    import time as _time

    log = logger or _logging.getLogger(__name__)
    items = list(iterable) if hasattr(iterable, "__len__") is False else iterable
    total = len(items)
    t0 = _time.time()
    iter_time = AverageMeter("iter")
    t_prev = t0
    for i, obj in enumerate(items):
        yield obj
        now = _time.time()
        iter_time.update(now - t_prev)
        t_prev = now
        if i % print_freq == 0 or i == total - 1:
            eta = iter_time.avg * (total - i - 1)
            mem = ""
            try:
                import jax as _jax

                stats = _jax.local_devices()[0].memory_stats() or {}
                if "bytes_in_use" in stats:
                    mem = f" mem {stats['bytes_in_use'] / 1e9:.2f}GB"
            except Exception:
                pass
            log.info(
                f"{header} [{i}/{total}] {iter_time.avg*1e3:.0f}ms/it eta {eta:.0f}s{mem}"
            )
    log.info(f"{header} total {_time.time() - t0:.1f}s")
