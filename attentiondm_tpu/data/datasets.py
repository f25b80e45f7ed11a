"""Dataset readers (self-contained: PIL + numpy; no torchvision/lmdb deps).

Capability parity with the reference data layer (datasets/__init__.py:30-181,
celeba.py, lsun.py, ffhq.py) re-hosted for this image's constraints:
CIFAR-10 reads the standard python pickle batches; CelebA applies the
reference's 140x140 center-crop box before resize; LSUN/FFHQ read image
folders (the reference's lmdb path is gated — lmdb is not installed here);
FFHQ keeps the seeded 90/10 split.  A synthetic dataset stands in for
ZeroQ's random calibration data (utils/data_utils.py:25-41) and for smoke
runs on a zero-egress machine.

All readers return float32 NHWC in [0, 1] via __getitem__/__len__.
"""
from __future__ import annotations

import os
import pickle

import numpy as np


class _Dataset:
    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, i):
        raise NotImplementedError


class SyntheticDataset(_Dataset):
    """Deterministic random images (uniform [0,1]); label is always 0."""

    def __init__(self, n: int, image_size: int, channels: int = 3, seed: int = 0):
        self.n = n
        rng = np.random.default_rng(seed)
        self.data = rng.random((n, image_size, image_size, channels), dtype=np.float32)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.data[i], 0


class Cifar10Dataset(_Dataset):
    """CIFAR-10 from the standard `cifar-10-batches-py` pickle files."""

    def __init__(self, root: str, train: bool = True):
        base = os.path.join(root, "cifar-10-batches-py")
        if not os.path.isdir(base):
            raise FileNotFoundError(
                f"CIFAR-10 not found at {base}; place the extracted "
                "cifar-10-batches-py directory there (no download egress)."
            )
        files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        xs, ys = [], []
        for f in files:
            with open(os.path.join(base, f), "rb") as fh:
                d = pickle.load(fh, encoding="bytes")
            xs.append(d[b"data"])
            ys.extend(d[b"labels"])
        x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.data = (x / 255.0).astype(np.float32)
        self.labels = np.asarray(ys, np.int64)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i], int(self.labels[i])


class ImageFolderDataset(_Dataset):
    """Flat folder (recursive) of images -> resized float32 NHWC.

    `crop_box` (left, upper, right, lower) is applied before resize —
    CelebA uses the reference's cx=89/cy=121 140x140 box
    (datasets/__init__.py:62-107).
    """

    EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")

    def __init__(self, root: str, image_size: int, crop_box=None, flip: bool = False, paths=None):
        from PIL import Image  # noqa: F401

        self.root = root
        self.image_size = image_size
        self.crop_box = crop_box
        self.flip = flip
        if paths is None:
            paths = []
            for dirpath, _dirs, files in os.walk(root):
                for f in sorted(files):
                    if f.lower().endswith(self.EXTS):
                        paths.append(os.path.join(dirpath, f))
            if not paths:
                raise FileNotFoundError(f"no images under {root}")
        self.paths = paths

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        from PIL import Image

        img = Image.open(self.paths[i]).convert("RGB")
        if self.crop_box is not None:
            img = img.crop(self.crop_box)
        img = img.resize((self.image_size, self.image_size), Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
        if self.flip and np.random.random() < 0.5:
            x = x[:, ::-1].copy()
        return x, 0


def celeba_crop_box():
    """The reference's CelebA face crop: center (89, 121), 140x140."""
    cx, cy, half = 89, 121, 70
    return (cx - half, cy - half, cx + half, cy + half)


class FFHQDataset(ImageFolderDataset):
    """FFHQ folder with the reference's seeded 90/10 train/val split
    (datasets/__init__.py:150-177: np.random RandomState(2019) permutation)."""

    def __init__(self, root: str, image_size: int, train: bool = True, flip: bool = False):
        probe = ImageFolderDataset(root, image_size)
        paths = probe.paths
        num = len(paths)
        indices = np.random.RandomState(2019).permutation(num)
        test_n = int(num * 0.1)
        sel = indices[test_n:] if train else indices[:test_n]
        super().__init__(root, image_size, flip=flip, paths=[paths[i] for i in sel])


def get_dataset(args, config):
    """Dataset factory keyed by config.data.dataset (reference
    datasets/__init__.py:30-181).  Returns (train_dataset, test_dataset)."""
    d = config.data
    name = d.dataset.upper()
    root = os.path.join(getattr(args, "exp", "exp"), "datasets")
    flip = bool(getattr(d, "random_flip", False))

    if name == "SYNTHETIC":
        n = getattr(d, "num_synthetic", 256)
        return (
            SyntheticDataset(n, d.image_size, d.channels, seed=0),
            SyntheticDataset(max(1, n // 10), d.image_size, d.channels, seed=1),
        )
    if name == "CIFAR10":
        r = os.path.join(root, "cifar10")
        return Cifar10Dataset(r, train=True), Cifar10Dataset(r, train=False)
    if name == "CELEBA":
        r = os.path.join(root, "celeba")
        box = celeba_crop_box()
        train = ImageFolderDataset(os.path.join(r, "train") if os.path.isdir(os.path.join(r, "train")) else r,
                                   d.image_size, crop_box=box, flip=flip)
        testdir = os.path.join(r, "test")
        test = ImageFolderDataset(testdir, d.image_size, crop_box=box) if os.path.isdir(testdir) else train
        return train, test
    if name == "LSUN":
        cat = getattr(d, "category", "bedroom")
        r = os.path.join(root, "lsun", cat)
        if not os.path.isdir(r):
            raise FileNotFoundError(
                f"LSUN/{cat} expected as an image folder at {r} "
                "(lmdb is not available in this environment)."
            )
        ds = ImageFolderDataset(r, d.image_size, flip=flip)
        return ds, ds
    if name == "FFHQ":
        r = os.path.join(root, "ffhq")
        return FFHQDataset(r, d.image_size, train=True, flip=flip), FFHQDataset(
            r, d.image_size, train=False
        )
    if name == "IMAGENET":
        r = os.path.join(root, "imagenet64")
        ds = ImageFolderDataset(r, d.image_size, flip=flip)
        return ds, ds
    raise NotImplementedError(f"dataset {d.dataset}")
