"""Dataset readers (self-contained: PIL + numpy; no torchvision/lmdb deps).

Capability parity with the reference data layer (datasets/__init__.py:30-181,
celeba.py, lsun.py, ffhq.py): CIFAR-10 reads the standard python pickle
batches; CelebA reads the official `list_eval_partition.txt` splits and
applies the reference's 128x128 face crop before resize (with an
image-folder fallback when the partition file is absent); LSUN and FFHQ
read their native lmdb databases through the pure-Python reader in
data/lmdb_reader.py (image-folder fallback likewise).  A synthetic dataset
stands in for ZeroQ's random calibration data (utils/data_utils.py:25-41)
and for smoke runs on a zero-egress machine.

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
    CelebA uses the reference's cx=89/cy=121 128x128 box (`celeba_crop_box`,
    ref datasets/__init__.py:62-107).
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


class _SubsetDataset(_Dataset):
    """Index-remapped view of another dataset (the reference's torch Subset)."""

    def __init__(self, base, indices):
        self.base = base
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.base[int(self.indices[i])]


def celeba_crop_box():
    """The reference's CelebA face crop (datasets/__init__.py:62-67):
    cx=89, cy=121, ±64 -> PIL box (left, upper, right, lower) 128x128."""
    cx, cy, half = 89, 121, 64
    return (cx - half, cy - half, cx + half, cy + half)


class CelebADataset(_Dataset):
    """CelebA with the OFFICIAL split file (reference datasets/celeba.py:8-162).

    Layout: `<root>/list_eval_partition.txt` + `<root>/img_align_celeba/*.jpg`.
    The partition file maps filename -> {0: train, 1: valid, 2: test}.  The
    diffusion pipeline consumes only images; attribute/identity/landmark
    targets the reference loads via pandas are irrelevant here and the label
    is always 0 (the reference's own runner ignores y as well).
    """

    SPLITS = {"train": 0, "valid": 1, "test": 2}

    def __init__(self, root: str, image_size: int, split: str = "train", flip: bool = False):
        part = os.path.join(root, "list_eval_partition.txt")
        if not os.path.isfile(part):
            raise FileNotFoundError(part)
        want = self.SPLITS[split]
        img_dir = os.path.join(root, "img_align_celeba")
        names = []
        with open(part) as f:
            for line in f:
                cols = line.split()
                if len(cols) >= 2 and int(cols[1]) == want:
                    names.append(cols[0])
        self._inner = ImageFolderDataset(
            img_dir, image_size, crop_box=celeba_crop_box(), flip=flip,
            paths=[os.path.join(img_dir, n) for n in names],
        )

    def __len__(self):
        return len(self._inner)

    def __getitem__(self, i):
        return self._inner[i]


class LSUNClassDataset(_Dataset):
    """One LSUN class from its lmdb (reference datasets/lsun.py:11-58).

    Keys are cached to `_cache_<dirname>` beside the lmdb directory exactly
    like the reference; images decode from the stored bytes and get the
    reference transform: Resize(shortest side = image_size) -> CenterCrop.
    """

    def __init__(self, root: str, image_size: int, flip: bool = False):
        from .lmdb_reader import LMDBReader

        self.db = LMDBReader(root)
        self.image_size = image_size
        self.flip = flip
        root = root.rstrip(os.sep)
        cache_file = os.path.join(os.path.dirname(root), f"_cache_{os.path.basename(root)}")
        if os.path.isfile(cache_file):
            with open(cache_file, "rb") as f:
                self.keys = pickle.load(f)
        else:
            self.keys = self.db.keys()
            with open(cache_file, "wb") as f:
                pickle.dump(self.keys, f)

    def __len__(self):
        return len(self.db)

    def __getitem__(self, i):
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(self.db.get(self.keys[i]))).convert("RGB")
        # Resize(shortest side) + CenterCrop(image_size), per the reference
        s = self.image_size
        w, h = img.size
        scale = s / min(w, h)
        img = img.resize((max(s, round(w * scale)), max(s, round(h * scale))), Image.BILINEAR)
        w, h = img.size
        left, top = (w - s) // 2, (h - s) // 2
        img = img.crop((left, top, left + s, top + s))
        x = np.asarray(img, np.float32) / 255.0
        if self.flip and np.random.random() < 0.5:
            x = x[:, ::-1].copy()
        return x, 0


class FFHQLmdbDataset(_Dataset):
    """FFHQ lmdb (reference datasets/ffhq.py:8-40): entry count under the
    `length` key, images under `f'{resolution}-{index:05d}'`."""

    def __init__(self, root: str, image_size: int, resolution: int = 256, flip: bool = False):
        from .lmdb_reader import LMDBReader

        self.db = LMDBReader(root)
        self.image_size = image_size
        self.resolution = resolution
        self.flip = flip
        length = self.db.get(b"length")
        if length is None:
            raise FileNotFoundError(f"{root}: no 'length' key — not an FFHQ lmdb")
        self.length = int(length.decode("utf-8"))

    def __len__(self):
        return self.length

    def __getitem__(self, i):
        import io

        from PIL import Image

        key = f"{self.resolution}-{str(i).zfill(5)}".encode("utf-8")
        img = Image.open(io.BytesIO(self.db.get(key))).convert("RGB")
        if img.size != (self.image_size, self.image_size):
            img = img.resize((self.image_size, self.image_size), Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
        if self.flip and np.random.random() < 0.5:
            x = x[:, ::-1].copy()
        return x, 0


def ffhq_split_indices(n: int):
    """The reference's seeded 90/10 split (datasets/__init__.py:165-177):
    seed-2019 shuffle, train = first 90%, test = LAST 10% — the slicing
    convention matters for comparability with reference-reported numbers."""
    indices = np.random.RandomState(2019).permutation(n)
    cut = int(n * 0.9)
    return indices[:cut], indices[cut:]


class FFHQDataset(ImageFolderDataset):
    """FFHQ folder with the reference's seeded 90/10 train/val split
    (ffhq_split_indices)."""

    def __init__(self, root: str, image_size: int, train: bool = True, flip: bool = False):
        probe = ImageFolderDataset(root, image_size)
        paths = probe.paths
        tr, te = ffhq_split_indices(len(paths))
        sel = tr if train else te
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
        if os.path.isfile(os.path.join(r, "list_eval_partition.txt")):
            # official layout (reference datasets/celeba.py; train/test splits
            # per datasets/__init__.py:69-107)
            return (
                CelebADataset(r, d.image_size, split="train", flip=flip),
                CelebADataset(r, d.image_size, split="test"),
            )
        train = ImageFolderDataset(os.path.join(r, "train") if os.path.isdir(os.path.join(r, "train")) else r,
                                   d.image_size, crop_box=box, flip=flip)
        testdir = os.path.join(r, "test")
        test = ImageFolderDataset(testdir, d.image_size, crop_box=box) if os.path.isdir(testdir) else train
        return train, test
    if name == "LSUN":
        cat = getattr(d, "category", "bedroom")
        lsun_root = os.path.join(root, "lsun")
        # native layout: <root>/lsun/<category>_{train,val}_lmdb
        # (reference datasets/__init__.py:109-152 + lsun.py:11-58)
        train_db = os.path.join(lsun_root, f"{cat}_train_lmdb")
        val_db = os.path.join(lsun_root, f"{cat}_val_lmdb")
        if os.path.isdir(train_db):
            train = LSUNClassDataset(train_db, d.image_size, flip=flip)
            if os.path.isdir(val_db):
                test = LSUNClassDataset(val_db, d.image_size)
            else:
                import logging

                logging.warning(
                    f"LSUN/{cat}: no val lmdb at {val_db}; evaluation will "
                    "run on the TRAINING set"
                )
                test = train
            return train, test
        r = os.path.join(lsun_root, cat)
        if not os.path.isdir(r):
            raise FileNotFoundError(
                f"LSUN/{cat}: expected lmdb at {train_db} or an image folder at {r}."
            )
        ds = ImageFolderDataset(r, d.image_size, flip=flip)
        return ds, ds
    if name == "FFHQ":
        r = os.path.join(root, "ffhq")
        if os.path.isfile(os.path.join(r, "data.mdb")) or r.endswith(".mdb"):
            res = getattr(d, "image_size", 256)
            ds = FFHQLmdbDataset(r, d.image_size, resolution=res, flip=flip)
            # the reference's seeded 90/10 split applies to the lmdb layout
            # too — without it the "test" set IS the training set
            tr, te = ffhq_split_indices(len(ds))
            return _SubsetDataset(ds, tr), _SubsetDataset(
                FFHQLmdbDataset(r, d.image_size, resolution=res), te
            )
        return FFHQDataset(r, d.image_size, train=True, flip=flip), FFHQDataset(
            r, d.image_size, train=False
        )
    if name == "IMAGENET":
        r = os.path.join(root, "imagenet64")
        ds = ImageFolderDataset(r, d.image_size, flip=flip)
        return ds, ds
    raise NotImplementedError(f"dataset {d.dataset}")
