"""Minimal batch iterator: shuffled epochs of stacked NHWC float32 batches.

Replaces torch DataLoader for this package's needs (the hot path is on-device
sampling; input pipelines here are light).  Deterministic under `seed`.
"""
from __future__ import annotations

import numpy as np


def iterate_batches(dataset, batch_size: int, *, shuffle=True, seed=0, drop_last=True):
    n = len(dataset)
    order = np.arange(n)
    rng = np.random.default_rng(seed)
    if shuffle:
        rng.shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    for s in range(0, end, batch_size):
        idx = order[s : s + batch_size]
        xs, ys = zip(*(dataset[int(i)] for i in idx))
        yield np.stack(xs).astype(np.float32), np.asarray(ys)
