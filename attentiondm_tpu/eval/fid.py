"""FID computation (port of the vendored pytorch-fid semantics).

Reference: pytorch-fid-master/src/pytorch_fid/fid_score.py — activation
statistics from a feature extractor, Frechet distance
||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)), path handling (.npz stats or
image directories), and the CLI.  TPU-native twist: features are computed in
jitted batches (shardable over a data mesh); only the 2048x2048 sqrtm stays
on host (scipy), as it must.
"""
from __future__ import annotations

import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_EXTENSIONS = {"bmp", "jpg", "jpeg", "pgm", "png", "ppm", "tif", "tiff", "webp"}


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """Frechet distance between two Gaussians (fid_score.py:152-206)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def frechet_smoke_safe(mu1, sigma1, mu2, sigma2, n1):
    """Frechet distance that stays real-valued at smoke scale.

    With fewer samples than feature dims (n1 < D) sigma1 is rank-deficient
    and sqrtm(S1 S2) goes complex; tr((S1 S2)^1/2) = sum sqrt(eigvals) is
    exact for PSD inputs and stable.  Real scoring (n >= D, e.g. 50k) stays
    on the canonical pytorch-fid recipe (calculate_frechet_distance).
    """
    if n1 >= sigma1.shape[0]:
        return calculate_frechet_distance(mu1, sigma1, mu2, sigma2)
    d = np.asarray(mu1) - np.asarray(mu2)
    ev = np.linalg.eigvals(np.asarray(sigma1) @ np.asarray(sigma2))
    return float(d @ d + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.sqrt(np.clip(ev.real, 0, None)).sum())


def get_activations(images_iter, extract_fn, batch_size=64):
    """Features for a stream of [N,H,W,C] float[0,1] arrays -> [total, D]."""
    jitted = jax.jit(extract_fn)
    feats = []
    for batch in images_iter:
        feats.append(np.asarray(jitted(jnp.asarray(batch))))
    return np.concatenate(feats, axis=0)


def calculate_activation_statistics(images_iter, extract_fn, batch_size=64):
    act = get_activations(images_iter, extract_fn, batch_size)
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def _iter_image_dir(path, batch_size):
    from PIL import Image

    path = pathlib.Path(path)
    files = sorted(
        f for ext in IMAGE_EXTENSIONS for f in path.glob(f"*.{ext}")
    )
    if not files:
        raise RuntimeError(f"no images found in {path}")
    batch = []
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        batch.append(img)
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def compute_statistics_of_path(path, extract_fn, batch_size=64):
    """Path -> (mu, sigma).  `.npz` files are precomputed stats
    (fid_score.py:234-246); directories are globbed for images."""
    if str(path).endswith(".npz"):
        with np.load(path) as f:
            return f["mu"][:], f["sigma"][:]
    return calculate_activation_statistics(_iter_image_dir(path, batch_size), extract_fn, batch_size)


def calculate_fid_given_paths(paths, extract_fn, batch_size=64):
    for p in paths:
        if not os.path.exists(p):
            raise RuntimeError(f"Invalid path: {p}")
    m1, s1 = compute_statistics_of_path(paths[0], extract_fn, batch_size)
    m2, s2 = compute_statistics_of_path(paths[1], extract_fn, batch_size)
    return calculate_frechet_distance(m1, s1, m2, s2)


def save_fid_stats(paths, extract_fn, batch_size=64):
    """Compute stats for paths[0] and save to paths[1] (.npz)
    (fid_score.py:268-285)."""
    mu, sigma = compute_statistics_of_path(paths[0], extract_fn, batch_size)
    np.savez_compressed(paths[1], mu=mu, sigma=sigma)


def sharded_statistics(images, extract_fn, mesh=None, batch_size=256):
    """On-device mu/sigma accumulation, batch-sharded over `mesh` when given.

    Accumulates sum(f) and sum(f f^T) on device (psum across shards happens
    inside jit via the sharded batch), so only [D] + [D,D] come back to host.

    `images` is either one [N,H,W,C] array (sliced into `batch_size` chunks)
    or an iterable of already-batched arrays (a streaming sampler: nothing
    ever materializes the full image set on host).
    """
    from ..parallel import shard_batch

    d = None
    n_total = 0
    s1 = None
    s2 = None

    @jax.jit
    def acc(batch):
        f = extract_fn(batch)
        return f.sum(axis=0), f.T @ f, f.shape[0]

    if hasattr(images, "shape"):
        batches = (
            jnp.asarray(images[i : i + batch_size])
            for i in range(0, len(images), batch_size)
        )
    else:
        batches = iter(images)
    for b in batches:
        b = jnp.asarray(b)
        if mesh is not None and b.shape[0] % mesh.devices.size == 0:
            b = shard_batch(mesh, b)
        fs, ffT, n = acc(b)
        s1 = fs if s1 is None else s1 + fs
        s2 = ffT if s2 is None else s2 + ffT
        n_total += int(n)
    mu = np.asarray(s1) / n_total
    sigma = (np.asarray(s2) - n_total * np.outer(mu, mu)) / (n_total - 1)
    return mu, sigma


def main(argv=None):
    """CLI: python -m attentiondm_tpu.eval.fid path1 path2 [--inception W.pth]"""
    import argparse

    p = argparse.ArgumentParser(description="FID between two paths (dirs or .npz stats)")
    p.add_argument("path", nargs=2)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--inception-weights", type=str, default=None,
                   help="torch pt_inception checkpoint to convert (required for canonical FID)")
    p.add_argument("--save-stats", action="store_true",
                   help="compute stats of path[0], save to path[1].npz")
    args = p.parse_args(argv)

    from .inception import InceptionV3FID

    if args.inception_weights:
        net = InceptionV3FID.from_torch(args.inception_weights)
    else:
        print("WARNING: no --inception-weights given; using random features "
              "(relative comparisons only, NOT canonical FID)")
        net = InceptionV3FID.random()

    if args.save_stats:
        save_fid_stats(args.path, net.extract, args.batch_size)
        return 0
    fid = calculate_fid_given_paths(args.path, net.extract, args.batch_size)
    print("FID: ", fid)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
