"""DDIM / DDPM samplers as `lax.scan` programs.

Capability parity with the reference samplers (functions/denoising.py:16-42
`generalized_steps`, :119-151 `ddpm_steps`) but TPU-native: the whole
trajectory stays on device inside a single jitted scan — no per-step
host<->device transfer (the reference offloads every x_t to CPU each step,
denoising.py:34,40, an anti-pattern this rebuild deliberately drops).

The model callable has signature ``model_fn(x, t, step_idx) -> eps`` where
``x`` is NHWC, ``t`` is a [N] float32 timestep vector and ``step_idx`` is the
integer position within the (reversed) sampling sequence — quantized models
use it to index their per-timestep quantization state; FP models ignore it.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import compute_alpha


def make_timestep_seq(num_timesteps: int, steps: int, skip_type: str = "uniform") -> np.ndarray:
    """Sub-sampled timestep sequence (increasing ints).

    Mirrors the reference's seq construction (runners/diffusion.py:319-329):
    quad -> linspace(0, sqrt(0.8 T), steps)^2.  `uniform` yields EXACTLY
    `steps` entries for any (T, steps) via linspace-floor — the reference's
    range(0, T, T//steps) silently produces more when T % steps != 0 (e.g.
    1000/300 -> 334); `uniform_ref` keeps that behavior for bit-exact parity.
    """
    if steps > num_timesteps:
        raise ValueError(f"steps ({steps}) cannot exceed num_timesteps ({num_timesteps})")
    if skip_type == "uniform":
        skip = num_timesteps // steps
        if num_timesteps % steps == 0:
            seq = np.arange(0, num_timesteps, skip)  # == reference grid
        else:
            seq = np.floor(np.linspace(0, num_timesteps - skip, steps)).astype(np.int64)
            seq = np.unique(seq)
            assert len(seq) == steps, (num_timesteps, steps)
    elif skip_type == "uniform_ref":
        skip = num_timesteps // steps
        seq = np.arange(0, num_timesteps, skip)
    elif skip_type == "quad":
        seq = (np.linspace(0, np.sqrt(num_timesteps * 0.8), steps)) ** 2
        seq = seq.astype(np.int64)
    else:
        raise NotImplementedError(skip_type)
    return seq


def _seq_alphas(betas: jax.Array, seq: Sequence[int]):
    """Per-step (alpha_bar_t, alpha_bar_next) for the reversed sequence."""
    seq = np.asarray(list(seq), dtype=np.int64)
    seq_next = np.concatenate([[-1], seq[:-1]])
    t_rev = jnp.asarray(seq[::-1].copy())
    tn_rev = jnp.asarray(seq_next[::-1].copy())
    at = compute_alpha(betas, t_rev)  # [S]
    at_next = compute_alpha(betas, tn_rev)  # [S]
    return t_rev, tn_rev, at, at_next


def ddim_step(xt, et, at, at_next, eta, noise):
    """One generalized (DDIM) update. Pure algebra, shapes broadcast.

    Reference: functions/denoising.py:33-39.
    Returns (xt_next, x0_t).
    """
    x0_t = (xt - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
    c1 = eta * jnp.sqrt((1.0 - at / at_next) * (1.0 - at_next) / (1.0 - at))
    c2 = jnp.sqrt((1.0 - at_next) - c1**2)
    xt_next = jnp.sqrt(at_next) * x0_t + c1 * noise + c2 * et
    return xt_next, x0_t


def ddpm_step(xt, et, at, atm1, t, noise):
    """One ancestral (DDPM) update.  Reference: functions/denoising.py:126-150.

    Returns (sample, x0_from_e). `t` is the scalar integer timestep (for the
    t == 0 noise mask).
    """
    beta_t = 1.0 - at / atm1
    x0_from_e = jnp.sqrt(1.0 / at) * xt - jnp.sqrt(1.0 / at - 1.0) * et
    x0_from_e = jnp.clip(x0_from_e, -1.0, 1.0)
    mean = (jnp.sqrt(atm1) * beta_t * x0_from_e + jnp.sqrt(1.0 - beta_t) * (1.0 - atm1) * xt) / (
        1.0 - at
    )
    mask = (t > 0).astype(xt.dtype)
    sample = mean + mask * jnp.exp(0.5 * jnp.log(beta_t)) * noise
    return sample, x0_from_e


def ddim_sample(
    model_fn: Callable,
    x: jax.Array,
    seq: Sequence[int],
    betas: jax.Array,
    *,
    eta: float = 0.0,
    key: jax.Array | None = None,
    keep_trajectory: bool = False,
):
    """Run the full DDIM trajectory under one `lax.scan`.

    Args:
      model_fn: ``(x, t, step_idx) -> eps`` noise predictor.
      x: initial noise, NHWC.
      seq: increasing timestep subsequence.
      betas: [T] schedule.
      eta: DDIM variance knob (0 = deterministic).
      key: PRNG key for the eta-noise (required when eta > 0).
      keep_trajectory: if True also return all intermediate x_t (stacked
        [S, N, H, W, C], on device) and x0 predictions — the calibration-set
        generator needs them (reference: runners/diffusion.py:214-251).

    Returns:
      x_final, or (x_final, xs, x0_preds) when keep_trajectory.
    """
    t_rev, _, at, at_next = _seq_alphas(betas, seq)
    n = x.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    def body(carry, inp):
        xt, k = carry
        t_i, at_i, atn_i, idx = inp
        et = model_fn(xt, jnp.full((n,), t_i, jnp.float32), idx)
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, xt.shape, xt.dtype) if eta > 0 else jnp.zeros_like(xt)
        xt_next, x0_t = ddim_step(xt, et, at_i, atn_i, eta, noise)
        ys = (xt_next, x0_t) if keep_trajectory else None
        return (xt_next, k), ys

    steps = jnp.arange(t_rev.shape[0], dtype=jnp.int32)
    (xf, _), ys = jax.lax.scan(body, (x, key), (t_rev.astype(jnp.float32), at, at_next, steps))
    if keep_trajectory:
        return xf, ys[0], ys[1]
    return xf


def ddpm_sample(
    model_fn: Callable,
    x: jax.Array,
    seq: Sequence[int],
    betas: jax.Array,
    *,
    key: jax.Array,
    keep_trajectory: bool = False,
):
    """Ancestral DDPM sampling under one `lax.scan` (functions/denoising.py:119-151)."""
    t_rev, tn_rev, at, atm1 = _seq_alphas(betas, seq)
    n = x.shape[0]

    def body(carry, inp):
        xt, k = carry
        t_i, at_i, atm1_i, idx = inp
        et = model_fn(xt, jnp.full((n,), t_i, jnp.float32), idx)
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, xt.shape, xt.dtype)
        sample, x0 = ddpm_step(xt, et, at_i, atm1_i, t_i, noise)
        ys = (sample, x0) if keep_trajectory else None
        return (sample, k), ys

    steps = jnp.arange(t_rev.shape[0], dtype=jnp.int32)
    (xf, _), ys = jax.lax.scan(body, (x, key), (t_rev.astype(jnp.float32), at, atm1, steps))
    if keep_trajectory:
        return xf, ys[0], ys[1]
    return xf
