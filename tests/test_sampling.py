import numpy as np
import jax
import jax.numpy as jnp

from attentiondm_tpu.diffusion import (
    DiffusionSchedule,
    ddim_sample,
    ddpm_sample,
    make_timestep_seq,
    compute_alpha,
    noise_estimation_loss,
)


def _betas(T=100):
    return DiffusionSchedule.create("linear", 1e-4, 0.02, T).betas


def test_make_timestep_seq_uniform():
    seq = make_timestep_seq(1000, 100, "uniform")
    assert len(seq) == 100
    assert seq[0] == 0 and seq[-1] == 990


def test_make_timestep_seq_uniform_exact_count():
    """`uniform` yields exactly `steps` strictly-increasing entries for ANY
    (T, steps) — the reference overshoots when T % steps != 0 (e.g.
    1000/300 -> 334 entries); `uniform_ref` preserves that for parity."""
    import numpy as np

    for T, steps in [(1000, 300), (1000, 100), (1000, 7), (100, 99), (17, 5), (1000, 1000)]:
        seq = make_timestep_seq(T, steps, "uniform")
        assert len(seq) == steps, (T, steps, len(seq))
        assert (np.diff(seq) > 0).all()
        assert seq[0] == 0 and seq[-1] < T
        if T % steps == 0:
            np.testing.assert_array_equal(seq, np.arange(0, T, T // steps))
    ref = make_timestep_seq(1000, 300, "uniform_ref")
    assert len(ref) == 334  # reference behavior, kept for bit-exact parity


def test_make_timestep_seq_quad():
    seq = make_timestep_seq(1000, 100, "quad")
    assert len(seq) == 100
    assert seq[0] == 0
    # quadratic spacing: int(linspace(0, sqrt(800), 100)^2)
    expect = (np.linspace(0, np.sqrt(800), 100) ** 2).astype(np.int64)
    np.testing.assert_array_equal(seq, expect)


def _numpy_ddim(x, seq, betas, eps_fn, eta=0.0):
    """Independent numpy oracle of the generalized-steps algebra."""
    betas = np.asarray(betas, np.float64)
    abar = np.cumprod(1 - np.concatenate([[0.0], betas]))
    seq = list(seq)
    seq_next = [-1] + seq[:-1]
    xt = np.asarray(x, np.float64)
    for i, j in zip(reversed(seq), reversed(seq_next)):
        at = abar[i + 1]
        at_next = abar[j + 1]
        et = eps_fn(xt, i)
        x0 = (xt - et * np.sqrt(1 - at)) / np.sqrt(at)
        c1 = eta * np.sqrt((1 - at / at_next) * (1 - at_next) / (1 - at))
        c2 = np.sqrt((1 - at_next) - c1**2)
        xt = np.sqrt(at_next) * x0 + c2 * et
    return xt


def test_ddim_matches_numpy_oracle():
    """The scanned sampler must reproduce the step algebra exactly (eta=0)."""
    T = 50
    betas = _betas(T)
    seq = make_timestep_seq(T, 10, "uniform")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 3))

    # a nontrivial but deterministic eps model: eps = tanh(x) * t/T
    def model_fn(xt, t, idx):
        return jnp.tanh(xt) * (t[0] / T)

    out = ddim_sample(model_fn, x, seq, betas, eta=0.0)
    expect = _numpy_ddim(
        np.asarray(x), seq, np.asarray(betas), lambda xt, i: np.tanh(xt) * (i / T)
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)


def test_ddim_trajectory_shapes():
    T = 20
    betas = _betas(T)
    seq = make_timestep_seq(T, 5, "uniform")
    x = jnp.ones((2, 4, 4, 3))
    xf, xs, x0s = ddim_sample(lambda x, t, i: jnp.zeros_like(x), x, seq, betas, keep_trajectory=True)
    assert xs.shape == (5, 2, 4, 4, 3)
    assert x0s.shape == (5, 2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(xf))


def test_ddim_zero_eps_closed_form():
    """With eps == 0 and eta == 0 the update contracts x by sqrt(at_next/at) each step,
    telescoping to sqrt(abar_first_next / abar_last)."""
    T = 30
    betas = _betas(T)
    seq = make_timestep_seq(T, 6, "uniform")
    x = jnp.full((1, 2, 2, 1), 3.0)
    out = ddim_sample(lambda x, t, i: jnp.zeros_like(x), x, seq, betas)
    a_last = float(compute_alpha(betas, jnp.array(int(seq[-1]))))
    # final alpha index is seq_next of the first processed step = -1 -> abar=1
    expect = 3.0 * np.sqrt(1.0 / a_last)
    np.testing.assert_allclose(np.asarray(out), np.full((1, 2, 2, 1), expect), rtol=1e-4)


def test_ddpm_runs_and_final_step_is_noiseless():
    T = 20
    betas = _betas(T)
    seq = make_timestep_seq(T, 5, "uniform")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    out1 = ddpm_sample(lambda x, t, i: jnp.zeros_like(x), x, seq, betas, key=jax.random.PRNGKey(2))
    assert out1.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out1)))


def test_ddim_jits_once():
    T = 20
    betas = _betas(T)
    seq = make_timestep_seq(T, 5, "uniform")
    f = jax.jit(lambda x: ddim_sample(lambda x, t, i: -x * 0.01, x, seq, betas))
    out = f(jnp.ones((1, 4, 4, 3)))
    assert out.shape == (1, 4, 4, 3)


def test_noise_estimation_loss_zero_when_model_predicts_e():
    T = 10
    betas = _betas(T)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 3))
    e = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    t = jnp.array([0, 3, 5, 9])
    loss, out = noise_estimation_loss(lambda x, tt: e, x0, t, e, betas)
    assert float(loss) == 0.0
