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
