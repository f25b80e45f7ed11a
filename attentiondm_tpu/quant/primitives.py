"""Asymmetric linear quantization primitives (pure functions).

Semantics-compatible rebuild of the reference quant math
(utils/quantization_utils/quant_utils.py:26-167): signed asymmetric
quantization with scale = (2^b - 1)/(max - min) and an integral zero-point
offset by 2^(b-1), straight-through-estimator gradients for round, and the
smooth two-sided clamp used throughout the reference
(utils/quant_util.py:62, 277) — which is value-identical to a hard clamp
with the same subgradient, so we use `jnp.clip` directly.

All functions broadcast: ranges may be scalars (per-tensor) or [C] vectors
applied along the trailing (channel) axis of NHWC activations / OIHW-last
weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lp_loss(pred, tgt, p: float = 2.0, reduction: str = "none"):
    """L_p-norm calibration loss (reference quant_utils.py:26-33)."""
    d = jnp.abs(pred - tgt) ** p
    if reduction == "none":
        return d.sum(axis=1).mean()
    return d.mean()


@jax.custom_vjp
def ste_round(x):
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


@jax.custom_vjp
def ste_floor(x):
    """floor with straight-through gradient — the AdaRound fold's rounding
    primitive (floor + learned offset), made differentiable for the
    serving-matched stage-2 surrogate."""
    return jnp.floor(x)


def _ste_floor_fwd(x):
    return jnp.floor(x), None


def _ste_floor_bwd(_, g):
    return (g,)


ste_floor.defvjp(_ste_floor_fwd, _ste_floor_bwd)


def asymmetric_quant_params(num_bits: int, sat_min, sat_max, integral_zero_point=True):
    """(scale, zero_point) for signed asymmetric quantization.

    Reference: quant_utils.py:109-133.  scale = (2^b - 1)/(max - min);
    zp = round(scale * min) + 2^(b-1).  Ranges broadcast elementwise.
    """
    n = 2**num_bits - 1
    scale = n / (sat_max - sat_min)
    zero_point = scale * sat_min
    if integral_zero_point:
        zero_point = jnp.round(zero_point)
    zero_point = zero_point + 2 ** (num_bits - 1)
    return scale, zero_point


def fake_quant(x, num_bits: int, sat_min, sat_max, ste: bool = True):
    """Quantize-dequantize x at `num_bits` with the given saturation range.

    The range tensors broadcast against the trailing axes of x (pass [C]
    vectors for per-channel quantization of channel-last tensors).
    Gradients flow straight through the rounding (STE) and are cut outside
    the clamp range, matching AsymmetricQuantFunction + the smooth clamp
    (quant_utils.py:136-167, quant_util.py:273-279).
    """
    scale, zp = asymmetric_quant_params(num_bits, sat_min, sat_max)
    rnd = ste_round if ste else jnp.round
    q = rnd(scale * x - zp)
    n = 2 ** (num_bits - 1)
    q = jnp.clip(q, -n, n - 1)
    return (q + zp) / scale


def quantize_int(x, scale, zp, num_bits: int, dtype=jnp.int8):
    """True integer quantization: round, clamp, cast (for the Pallas int path)."""
    n = 2 ** (num_bits - 1)
    q = jnp.clip(jnp.round(scale * x - zp), -n, n - 1)
    return q.astype(dtype)


def dequantize_int(q, scale, zp, dtype=jnp.float32):
    return (q.astype(dtype) + zp) / scale


def percentile_range(x, percentile: float = 0.9999):
    """(low, high) percentile-clipped range of a tensor — the outlier-robust
    alternative to min/max range calibration (reference
    find_scale_by_percentile_min/max, utils/quant_util.py:440-450).
    Traceable (jnp.quantile)."""
    flat = x.reshape(-1)
    low = jnp.quantile(flat, 1.0 - percentile)
    high = jnp.quantile(flat, percentile)
    return low, high
