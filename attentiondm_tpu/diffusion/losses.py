"""Training / calibration losses.  Reference: functions/losses.py:4-20."""
from __future__ import annotations

import jax.numpy as jnp


def noise_estimation_loss(model_fn, x0, t, e, betas, keepdim=False):
    """Epsilon-prediction MSE.

    q_t(x) = sqrt(a_bar) x0 + sqrt(1 - a_bar) e; loss = ||e - model(x_t, t)||^2
    summed over pixels (reference sums over CHW then means over batch).
    `t` is an integer [N] vector.
    """
    a = jnp.cumprod(1.0 - betas)[t].reshape(-1, 1, 1, 1)
    x = x0 * jnp.sqrt(a) + e * jnp.sqrt(1.0 - a)
    output = model_fn(x, t.astype(jnp.float32))
    se = jnp.square(e - output).sum(axis=(1, 2, 3))
    if keepdim:
        return se, output
    return se.mean(), output


loss_registry = {"simple": noise_estimation_loss}
