"""Batch iterator: shuffled epochs of stacked NHWC float32 batches, with an
optional threaded prefetch pipeline.

Replaces torch DataLoader (reference runners/diffusion.py:104-108 wraps the
train set in `DataLoader(..., num_workers=config.data.num_workers)`;
cifar10.yml sets 4 workers).  `workers=0` is the synchronous path;
`workers=N` assembles up to `prefetch` batches ahead on a thread pool —
image decode (PIL) releases the GIL, so LSUN/FFHQ 256x256 webp decoding
overlaps the device step.  Output is byte-identical to the synchronous path
for any worker count (batches are whole-batch jobs consumed in submission
order), so determinism under `seed` is preserved.
"""
from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _batch_slices(n: int, batch_size: int, shuffle: bool, seed: int, drop_last: bool):
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    return [order[s : s + batch_size] for s in range(0, end, batch_size)]


def iterate_batches(
    dataset,
    batch_size: int,
    *,
    shuffle=True,
    seed=0,
    drop_last=True,
    workers: int = 0,
    prefetch: int | None = None,
):
    """Yield (x [B,H,W,C] float32, y [B]) batches for one epoch.

    workers=0: fetch synchronously in the caller's thread (the round-2
    behavior).  workers>0: build batches on a ThreadPoolExecutor, keeping up
    to `prefetch` (default max(2, workers)) in flight; a worker exception
    surfaces on the yield of its batch.
    """
    slices = _batch_slices(len(dataset), batch_size, shuffle, seed, drop_last)

    def build(idx):
        xs, ys = zip(*(dataset[int(i)] for i in idx))
        return np.stack(xs).astype(np.float32), np.asarray(ys)

    if workers <= 0:
        for idx in slices:
            yield build(idx)
        return

    depth = max(2, workers) if prefetch is None else max(1, prefetch)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        pending: collections.deque = collections.deque()
        try:
            for idx in slices:
                pending.append(ex.submit(build, idx))
                if len(pending) >= depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            # early generator close: drop queued work so executor shutdown
            # (context-manager join) doesn't run the rest of the epoch
            for f in pending:
                f.cancel()
