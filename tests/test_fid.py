import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attentiondm_tpu.eval import (
    calculate_frechet_distance,
    calculate_activation_statistics,
    calculate_fid_given_paths,
    compute_statistics_of_path,
    save_fid_stats,
    inception_init,
    inception_apply,
)
from attentiondm_tpu.eval.fid import sharded_statistics


def test_frechet_equal_gaussians_is_zero():
    mu = np.random.default_rng(0).normal(size=16)
    A = np.random.default_rng(1).normal(size=(16, 16))
    sigma = A @ A.T + np.eye(16)
    assert calculate_frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-4)


def test_frechet_equal_cov_is_mean_distance():
    """With equal covariances FID reduces to ||mu1-mu2||^2 — the analytic
    check the reference's vendored tests use (test_fid_score.py:14-44)."""
    rng = np.random.default_rng(2)
    mu1, mu2 = rng.normal(size=8), rng.normal(size=8)
    A = rng.normal(size=(8, 8))
    sigma = A @ A.T + np.eye(8)
    fid = calculate_frechet_distance(mu1, sigma, mu2, sigma)
    assert fid == pytest.approx(float(np.sum((mu1 - mu2) ** 2)), rel=1e-4)


def test_frechet_diagonal_closed_form():
    """Diagonal Gaussians: FID = |mu|^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    mu1 = np.zeros(4)
    mu2 = np.ones(4)
    s1 = np.diag([1.0, 2.0, 3.0, 4.0])
    s2 = np.diag([4.0, 3.0, 2.0, 1.0])
    expect = 4.0 + np.sum((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2)
    fid = calculate_frechet_distance(mu1, s1, mu2, s2)
    assert fid == pytest.approx(expect, rel=1e-5)


def _mean_pool_extractor(x):
    """Mock feature extractor (the reference mocks InceptionV3 the same way:
    mean-pool the image into a small feature vector)."""
    n = x.shape[0]
    return x.reshape(n, -1, 3).mean(axis=1)


def test_activation_statistics_exact():
    rng = np.random.default_rng(3)
    imgs = rng.random((10, 4, 4, 3)).astype(np.float32)
    mu, sigma = calculate_activation_statistics([imgs], _mean_pool_extractor)
    feats = imgs.reshape(10, -1, 3).mean(axis=1)
    np.testing.assert_allclose(mu, feats.mean(0), rtol=1e-5)
    np.testing.assert_allclose(sigma, np.cov(feats, rowvar=False), rtol=1e-4)


def test_fid_paths_and_stats_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(4)
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(d1 / f"{i}.png")
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(d2 / f"{i}.png")

    fid_ab = calculate_fid_given_paths([str(d1), str(d2)], _mean_pool_extractor, batch_size=4)
    assert np.isfinite(fid_ab) and fid_ab >= 0
    fid_aa = calculate_fid_given_paths([str(d1), str(d1)], _mean_pool_extractor, batch_size=4)
    assert fid_aa == pytest.approx(0.0, abs=1e-4)

    # .npz stats path (fid_score.py:234-246)
    stats = tmp_path / "stats.npz"
    save_fid_stats([str(d1), str(stats)], _mean_pool_extractor, batch_size=4)
    mu, sigma = compute_statistics_of_path(str(stats), _mean_pool_extractor)
    fid_via_stats = calculate_fid_given_paths([str(stats), str(d2)], _mean_pool_extractor, 4)
    assert fid_via_stats == pytest.approx(fid_ab, rel=1e-4)


def test_fid_invalid_path():
    with pytest.raises(RuntimeError):
        calculate_fid_given_paths(["/nope/a", "/nope/b"], _mean_pool_extractor)


def test_sharded_statistics_matches_direct():
    from attentiondm_tpu.parallel import make_mesh

    rng = np.random.default_rng(5)
    imgs = rng.random((32, 4, 4, 3)).astype(np.float32)
    mu_d, sig_d = calculate_activation_statistics([imgs], _mean_pool_extractor)
    mesh = make_mesh(8)
    mu_s, sig_s = sharded_statistics(imgs, _mean_pool_extractor, mesh=mesh, batch_size=16)
    np.testing.assert_allclose(mu_s, mu_d, rtol=1e-5)
    np.testing.assert_allclose(sig_s, sig_d, rtol=1e-4, atol=1e-6)


def test_inception_forward_shape():
    """Architecture sanity: random weights, tiny batch -> [N, 2048] finite."""
    params = inception_init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(6).random((2, 32, 32, 3)), jnp.float32)
    f = inception_apply(params, x)
    assert f.shape == (2, 2048)
    assert bool(jnp.isfinite(f).all())
