"""PNG image IO (PIL-based; replaces torchvision.utils.save_image)."""
from __future__ import annotations

import math
import os

import numpy as np


def _to_uint8(x):
    x = np.asarray(x)
    x = np.clip(x, 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(np.uint8)


def save_image(x, path: str):
    """Save one HWC float [0,1] image as PNG."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = _to_uint8(x)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def save_image_grid(xs, path: str, nrow: int | None = None, pad: int = 2):
    """Save a batch [N,H,W,C] as one tiled PNG grid."""
    from PIL import Image

    xs = np.asarray(xs)
    n, h, w, c = xs.shape
    nrow = nrow or int(math.ceil(math.sqrt(n)))
    ncol = int(math.ceil(n / nrow))
    grid = np.ones((ncol * (h + pad) - pad, nrow * (w + pad) - pad, c), np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * (h + pad) : r * (h + pad) + h, col * (w + pad) : col * (w + pad) + w] = xs[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = _to_uint8(grid)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
