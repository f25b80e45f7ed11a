"""Diffusion noise schedules as pure functions.

Capability parity with the reference `get_beta_schedule`
(reference: runners/diffusion.py:34-64) plus the `cosine` schedule that
imagenet64.yml requests but the reference never implemented (defect D8 in
SURVEY.md): here it is a first-class schedule.

Everything is computed in float64 on host (numpy) once, then frozen into a
`DiffusionSchedule` pytree of float32 device arrays; nothing here is traced.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def get_beta_schedule(
    beta_schedule: str,
    *,
    beta_start: float,
    beta_end: float,
    num_diffusion_timesteps: int,
) -> np.ndarray:
    """Return betas[T] (float64 numpy) for the named schedule.

    Supported: quad | linear | const | jsd | sigmoid | cosine.
    Matches the reference semantics for the first five
    (runners/diffusion.py:38-62); `cosine` follows Nichol & Dhariwal 2021
    (alpha_bar(t) = cos^2((t/T + s)/(1+s) * pi/2), s = 0.008).
    """
    T = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(T, dtype=np.float64)
    elif beta_schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        x = np.linspace(-6, 6, T)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    elif beta_schedule == "cosine":
        s = 0.008
        steps = np.arange(T + 1, dtype=np.float64)
        alpha_bar = np.cos(((steps / T) + s) / (1 + s) * math.pi / 2) ** 2
        betas = np.clip(1.0 - alpha_bar[1:] / alpha_bar[:-1], 0.0, 0.999)
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (T,)
    return betas


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed schedule tensors, all shape [T] float32 (a pytree).

    `logvar` follows the reference's var_type semantics
    (runners/diffusion.py:93-98): fixedlarge -> log(beta),
    fixedsmall -> log(posterior_variance clamped at 1e-20).
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    logvar: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @staticmethod
    def create(
        beta_schedule: str,
        beta_start: float,
        beta_end: float,
        num_diffusion_timesteps: int,
        var_type: str = "fixedlarge",
    ) -> "DiffusionSchedule":
        betas = get_beta_schedule(
            beta_schedule,
            beta_start=beta_start,
            beta_end=beta_end,
            num_diffusion_timesteps=num_diffusion_timesteps,
        )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        if var_type == "fixedlarge":
            logvar = np.log(betas)
        elif var_type == "fixedsmall":
            logvar = np.log(np.maximum(posterior_variance, 1e-20))
        else:
            raise NotImplementedError(var_type)
        return DiffusionSchedule(
            betas=jnp.asarray(betas, jnp.float32),
            alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
            logvar=jnp.asarray(logvar, jnp.float32),
        )

    @classmethod
    def from_config(cls, config) -> "DiffusionSchedule":
        d = config.diffusion
        return cls.create(
            d.beta_schedule,
            d.beta_start,
            d.beta_end,
            d.num_diffusion_timesteps,
            var_type=getattr(config.model, "var_type", "fixedlarge"),
        )


def compute_alpha(betas: jax.Array, t: jax.Array) -> jax.Array:
    """alpha_bar at index t with the reference's prepend-zero convention.

    Reference: functions/denoising.py:8-11 — beta gets a zero prepended so
    that t = -1 maps to alpha_bar = 1. `t` is integer, any shape; returns the
    cumulative product indexed at t+1 (same shape as t).
    """
    betas = jnp.concatenate([jnp.zeros((1,), betas.dtype), betas])
    a = jnp.cumprod(1.0 - betas)
    return a[t + 1]
