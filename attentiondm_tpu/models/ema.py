"""Exponential moving average of params, as pure pytree ops.

Reference: models/ema.py:4-49 (`EMAHelper`).  shadow <- (1-mu)*p + mu*shadow.
"""
from __future__ import annotations

import jax


def ema_init(params):
    return jax.tree_util.tree_map(lambda p: p, params)


def ema_update(shadow, params, mu: float = 0.999):
    return jax.tree_util.tree_map(lambda s, p: (1.0 - mu) * p + mu * s, shadow, params)


def ema_params(shadow):
    """The EMA weights to sample with (identity — kept for API symmetry)."""
    return shadow
