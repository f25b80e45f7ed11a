import numpy as np
import jax.numpy as jnp
import pytest

from attentiondm_tpu.diffusion import get_beta_schedule, DiffusionSchedule, compute_alpha


ALL_SCHEDULES = ["quad", "linear", "const", "jsd", "sigmoid", "cosine"]


@pytest.mark.parametrize("name", ALL_SCHEDULES)
def test_beta_schedule_shapes(name):
    b = get_beta_schedule(name, beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100)
    assert b.shape == (100,)
    assert np.all(b > 0) and np.all(b <= 1)


def test_linear_endpoints():
    b = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000)
    assert b[0] == pytest.approx(1e-4)
    assert b[-1] == pytest.approx(0.02)


def test_quad_is_squared_linspace():
    b = get_beta_schedule("quad", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=10)
    expect = np.linspace(1e-2, 0.02**0.5, 10) ** 2
    np.testing.assert_allclose(b, expect, rtol=1e-12)


def test_jsd():
    b = get_beta_schedule("jsd", beta_start=0, beta_end=0, num_diffusion_timesteps=4)
    np.testing.assert_allclose(b, [1 / 4, 1 / 3, 1 / 2, 1.0])


def test_cosine_monotone_alphabar():
    b = get_beta_schedule("cosine", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000)
    abar = np.cumprod(1 - b)
    assert np.all(np.diff(abar) < 0)
    assert abar[0] > 0.999 and abar[-1] < 1e-3


def test_unknown_schedule_raises():
    with pytest.raises(NotImplementedError):
        get_beta_schedule("nope", beta_start=0, beta_end=1, num_diffusion_timesteps=10)


def test_compute_alpha_prepend_zero_convention():
    betas = jnp.asarray(
        get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=50),
        jnp.float32,
    )
    # t = -1 -> alpha_bar = 1 (the prepended zero beta)
    a = compute_alpha(betas, jnp.array([-1]))
    np.testing.assert_allclose(np.asarray(a), [1.0], rtol=1e-6)
    # t = 0 -> 1 - beta_0
    a0 = compute_alpha(betas, jnp.array([0]))
    np.testing.assert_allclose(np.asarray(a0), [1 - 1e-4], rtol=1e-6)
    # t = T-1 -> full cumprod
    aT = compute_alpha(betas, jnp.array([49]))
    np.testing.assert_allclose(np.asarray(aT), np.prod(1 - np.asarray(betas)), rtol=1e-5)


@pytest.mark.parametrize("var_type", ["fixedlarge", "fixedsmall"])
def test_schedule_pytree(var_type):
    s = DiffusionSchedule.create("linear", 1e-4, 0.02, 100, var_type=var_type)
    assert s.num_timesteps == 100
    assert s.alphas_cumprod.shape == (100,)
    if var_type == "fixedlarge":
        np.testing.assert_allclose(np.asarray(s.logvar), np.log(np.asarray(s.betas)), rtol=1e-6)
    import jax

    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 3
