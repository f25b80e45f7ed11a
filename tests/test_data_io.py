import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attentiondm_tpu.config import load_config
from attentiondm_tpu.data import (
    data_transform,
    inverse_data_transform,
    SyntheticDataset,
    iterate_batches,
)
from attentiondm_tpu.data.datasets import Cifar10Dataset, ImageFolderDataset, celeba_crop_box, get_dataset
from attentiondm_tpu.utils import save_image, save_image_grid
from attentiondm_tpu import checkpoint as ckpt_io


def test_data_transform_roundtrip_rescaled():
    cfg = load_config("cifar10.yml")
    x = np.random.default_rng(0).random((2, 8, 8, 3)).astype(np.float32)
    y = data_transform(cfg, x)
    assert y.min() >= -1.0 and y.max() <= 1.0
    back = inverse_data_transform(cfg, y)
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_inverse_clamps():
    cfg = load_config("cifar10.yml")
    out = inverse_data_transform(cfg, np.array([[-5.0, 5.0]]))
    np.testing.assert_allclose(out, [[0.0, 1.0]])


def test_synthetic_dataset_and_loader():
    ds = SyntheticDataset(20, 8)
    assert len(ds) == 20
    x, y = ds[0]
    assert x.shape == (8, 8, 3) and 0 <= x.min() and x.max() <= 1
    batches = list(iterate_batches(ds, 8, seed=0))
    assert len(batches) == 2  # drop_last
    assert batches[0][0].shape == (8, 8, 8, 3)
    # deterministic under same seed
    b2 = list(iterate_batches(ds, 8, seed=0))
    np.testing.assert_array_equal(batches[0][0], b2[0][0])


def test_natural_batch_statistics():
    """The natural-statistics distribution (VERDICT r3 item 6) must show the
    three properties the quality protocol needs: a ~1/f^2 power spectrum, a
    heavy contrast tail (some images clip hard), and per-image contrast
    spread — none of which the procedural shapes have."""
    import jax

    from attentiondm_tpu.data.synthetic import natural_batch

    x = np.asarray(natural_batch(jax.random.PRNGKey(0), 64, 32))
    assert x.shape == (64, 32, 32, 3)
    assert np.isfinite(x).all() and x.min() >= -1.0 and x.max() <= 1.0
    # heavy tail: a real fraction of pixels sits at the clip boundary
    assert 0.01 < (np.abs(x) >= 0.999).mean() < 0.5
    # 1/f^alpha spectrum on luminance, alpha in the natural-image band
    lum = x.mean(-1)
    F = np.abs(np.fft.fft2(lum)) ** 2
    f = np.sqrt(np.fft.fftfreq(32)[:, None] ** 2 + np.fft.fftfreq(32)[None, :] ** 2)
    m = (f > 0.03) & (f < 0.45)
    slope = np.polyfit(np.log(f[m]), np.log(F.mean(0)[m]), 1)[0]
    assert -2.6 < slope < -1.2, slope
    # contrast varies across images (lognormal gain)
    stds = x.std(axis=(1, 2, 3))
    assert stds.max() / stds.min() > 2.0


def test_prefetch_loader_matches_sync():
    """workers=N must produce byte-identical batches to workers=0, for any
    worker/prefetch depth (whole-batch jobs consumed in submission order)."""
    ds = SyntheticDataset(37, 8)
    sync = list(iterate_batches(ds, 8, seed=3))
    for workers, prefetch in ((1, None), (3, 1), (4, 8)):
        got = list(iterate_batches(ds, 8, seed=3, workers=workers, prefetch=prefetch))
        assert len(got) == len(sync)
        for (xs, ys), (xg, yg) in zip(sync, got):
            np.testing.assert_array_equal(xs, xg)
            np.testing.assert_array_equal(ys, yg)


def test_prefetch_loader_propagates_errors_and_closes():
    class Flaky:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            if i == 17:
                raise ValueError("boom")
            return np.zeros((4, 4, 3), np.float32), 0

    with pytest.raises(ValueError, match="boom"):
        # shuffle off so the failing index lands deterministically
        list(iterate_batches(Flaky(), 8, shuffle=False, workers=2))
    # early close must not deadlock the executor join
    it = iterate_batches(SyntheticDataset(64, 8), 8, seed=0, workers=2)
    next(it)
    it.close()


def test_cifar10_reader(tmp_path):
    # construct a minimal fake cifar batch layout
    import pickle

    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        d = {
            b"data": rng.integers(0, 255, (10, 3072), dtype=np.uint8),
            b"labels": list(rng.integers(0, 10, 10)),
        }
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(d, f)
    with open(base / "test_batch", "wb") as f:
        pickle.dump(
            {b"data": rng.integers(0, 255, (4, 3072), dtype=np.uint8), b"labels": [0, 1, 2, 3]}, f
        )
    train = Cifar10Dataset(str(tmp_path))
    test = Cifar10Dataset(str(tmp_path), train=False)
    assert len(train) == 50 and len(test) == 4
    x, y = train[0]
    assert x.shape == (32, 32, 3) and x.dtype == np.float32


def test_cifar10_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        Cifar10Dataset(str(tmp_path / "nope"))


def test_image_folder_and_crop(tmp_path):
    from PIL import Image

    for i in range(3):
        Image.fromarray(np.full((178, 218, 3), i * 40, np.uint8).transpose(1, 0, 2)).save(
            tmp_path / f"{i}.png"
        )
    ds = ImageFolderDataset(str(tmp_path), 64, crop_box=celeba_crop_box())
    assert len(ds) == 3
    x, _ = ds[1]
    assert x.shape == (64, 64, 3)


def test_get_dataset_synthetic():
    import argparse

    cfg = load_config("cifar10.yml")
    cfg.data.dataset = "SYNTHETIC"
    cfg.data.num_synthetic = 32
    args = argparse.Namespace(exp="/tmp/x")
    tr, te = get_dataset(args, cfg)
    assert len(tr) == 32


def test_save_images(tmp_path):
    x = np.random.default_rng(0).random((4, 8, 8, 3)).astype(np.float32)
    save_image(x[0], str(tmp_path / "one.png"))
    save_image_grid(x, str(tmp_path / "grid.png"), nrow=2)
    from PIL import Image

    g = np.asarray(Image.open(tmp_path / "grid.png"))
    assert g.shape == (2 * 8 + 2, 2 * 8 + 2, 3)


def test_checkpoint_roundtrip(tmp_path):
    from attentiondm_tpu.models import UNetConfig, unet_init
    from attentiondm_tpu.quant import QuantizedUNet

    cfg = UNetConfig(ch=32, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(), resolution=8)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    p = str(tmp_path / "params.npz")
    ckpt_io.save_checkpoint(p, params)
    like = unet_init(jax.random.PRNGKey(1), cfg)
    loaded = ckpt_io.load_checkpoint(p, like)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # dataclass pytrees (quant state) round-trip too
    q = QuantizedUNet.create(cfg, 8)
    qs = q.init_state(3)
    p2 = str(tmp_path / "q.npz")
    ckpt_io.save_checkpoint(p2, qs)
    loaded = ckpt_io.load_checkpoint(p2, q.init_state(3))
    np.testing.assert_array_equal(
        np.asarray(qs["conv_in"].alpha_logits), np.asarray(loaded["conv_in"].alpha_logits)
    )


def test_checkpoint_missing_key(tmp_path):
    p = str(tmp_path / "c.npz")
    ckpt_io.save_checkpoint(p, {"a": jnp.ones(3)})
    with pytest.raises(KeyError):
        ckpt_io.load_checkpoint(p, {"a": jnp.ones(3), "b": jnp.ones(2)})
