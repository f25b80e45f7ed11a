"""Per-layer quantization state as explicit pytrees.

This replaces the reference's stateful `QModule` (utils/quant_util.py:70-348)
— which tracked the current timestep with a mutable `index_seq` plus a global
`seq` counter (defect D11 in SURVEY.md) — with pure functions over a
`ActQuantState` pytree indexed by an explicit step argument.

State layout per quantized conv (S = number of sampler steps, C = in
channels, G = group count):
  init_range    [S, 2]      LAPQ-searched base range floor (init -4 / +6,
                            reference quant_util.py:91-92, 237-254)
  act_min/max   [S, C]      group-snapped per-channel calibrated ranges
  group_ranges  [S, G, 2]   per-group (min, max) thresholds
  alpha_logits  [S, G, C]   differentiable group-selection logits
                            (init 0.01, reference quant_util.py:119-120)

Weight quantization is real per-output-channel asymmetric quantization at
w_bit — the reference's `_quantize_weight` clamps against never-calibrated
zero ranges and destroys the weights (defect D4); this rebuild implements the
intended behavior.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .primitives import asymmetric_quant_params, fake_quant
from . import primitives


@dataclasses.dataclass(frozen=True)
class ActQuantConfig:
    """Static (non-pytree) quantization hyperparameters for one layer."""

    w_bit: int = 8
    a_bit: int = 8
    group_num: int = 8
    init_min: float = -4.0
    init_max: float = 6.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ActQuantState:
    init_range: jax.Array  # [S, 2]
    act_min: jax.Array  # [S, C]
    act_max: jax.Array  # [S, C]
    group_ranges: jax.Array  # [S, G, 2]
    alpha_logits: jax.Array  # [S, G, C]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WeightQuantState:
    w_min: jax.Array  # [C_out]
    w_max: jax.Array  # [C_out]


def init_act_quant_state(num_steps: int, in_channels: int, cfg: ActQuantConfig) -> ActQuantState:
    S, C, G = num_steps, in_channels, cfg.group_num
    return ActQuantState(
        init_range=jnp.tile(jnp.array([[cfg.init_min, cfg.init_max]], jnp.float32), (S, 1)),
        act_min=jnp.zeros((S, C), jnp.float32),
        act_max=jnp.zeros((S, C), jnp.float32),
        group_ranges=jnp.zeros((S, G, 2), jnp.float32),
        alpha_logits=jnp.full((S, G, C), 0.01, jnp.float32),
    )


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------


# shrink grid: fine 1.00..0.55 (step 0.03) + coarse tail for heavy-outlier
# channels; argmin per channel, so extra candidates can only help
WEIGHT_MSE_SHRINKS = tuple(1.0 - 0.03 * i for i in range(16)) + (0.45, 0.35, 0.25, 0.15)


def make_weight_quant_state(w: jax.Array, w_bit: int | None = None) -> WeightQuantState:
    """Per-output-channel ranges from the checkpoint weights.

    `w` is HWIO (TPU conv layout): reduce over all axes but the last (O).
    Ranges are clamped so zero is representable and min < max.

    With `w_bit` given, each channel's range is additionally shrunk by the
    factor (searched over a 16-point grid) minimizing that channel's weight
    reconstruction MSE at `w_bit` — trading a little clipping for less
    rounding error.  Not in the reference (whose weight "quantization" is
    defect D4); standard PTQ practice and the dominant quality lever at 4
    bits (measured: tools/quality_protocol.py `w4only` row, PERFORMANCE.md).
    """
    axes = tuple(range(w.ndim - 1))
    w_min = jnp.minimum(w.min(axis=axes), 0.0)
    w_max = jnp.maximum(w.max(axis=axes), 1e-8)
    if w_bit is None:
        return WeightQuantState(w_min=w_min, w_max=w_max)

    # Host-side numpy: this runs once per layer OUTSIDE jit, and an XLA
    # version costs a compile per distinct kernel shape (~7 s each in this
    # environment) for a microseconds-sized computation.
    import numpy as np

    wn = np.asarray(w, np.float32).reshape(-1, w.shape[-1])  # [M, O]
    mn = np.asarray(w_min, np.float32)
    mx = np.asarray(w_max, np.float32)
    n_lv = 2.0**w_bit - 1.0
    half = 2.0 ** (w_bit - 1)
    best_err = None
    best_k = np.ones_like(mn)
    for k in WEIGHT_MSE_SHRINKS:
        scale = n_lv / ((mx - mn) * k)
        zp = np.round(scale * mn * k) + half
        q = np.clip(np.round(wn * scale - zp), -half, half - 1)
        err = np.square((q + zp) / scale - wn).sum(axis=0)  # [O]
        if best_err is None:
            best_err = err
        else:
            better = err < best_err
            best_err = np.where(better, err, best_err)
            best_k = np.where(better, k, best_k)
    best = jnp.asarray(best_k, w.dtype)
    return WeightQuantState(w_min=w_min * best, w_max=w_max * best)


def quantize_weight_per_channel(w: jax.Array, wq: WeightQuantState, w_bit: int) -> jax.Array:
    """Fake-quantize HWIO weights per output channel at w_bit."""
    return fake_quant(w, w_bit, wq.w_min, wq.w_max, ste=False)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def mixed_ranges(state: ActQuantState, idx):
    """Per-channel (min, max) from the softmax group mixture at step `idx`.

    Inference-path semantics (reference quant_util.py:260-267): the learned
    per-channel softmax over groups mixes the G scalar group thresholds into
    one effective range per channel.
    """
    sw = jax.nn.softmax(state.alpha_logits[idx], axis=0)  # [G, C]
    gr = state.group_ranges[idx]  # [G, 2]
    rmin = (gr[:, 0:1] * sw).sum(axis=0)  # [C]
    rmax = (gr[:, 1:2] * sw).sum(axis=0)  # [C]
    return rmin, rmax


def quantize_activation(x: jax.Array, state: ActQuantState, idx, a_bit: int) -> jax.Array:
    """Fake-quantize channel-last activations at step `idx` (inference path)."""
    rmin, rmax = mixed_ranges(state, idx)
    return fake_quant(x, a_bit, rmin, rmax)


def quantize_activation_mixture(
    x: jax.Array, group_ranges: jax.Array, alpha_logits: jax.Array, a_bit: int
) -> jax.Array:
    """Differentiable-calibration path: mix the G quantized OUTPUTS.

    Reference `calibrate_quantization` (quant_util.py:207-223): each group
    range quantizes the whole tensor; the per-channel softmax over
    `alpha_logits` [G, C] mixes the G candidate outputs.  Gradients reach the
    logits through the mixture weights.
    """
    sw = jax.nn.softmax(alpha_logits, axis=0)  # [G, C]
    xg = jax.vmap(lambda gr: fake_quant(x, a_bit, gr[0], gr[1]))(group_ranges)  # [G, ...]
    sw_b = sw.reshape(sw.shape[:1] + (1,) * (x.ndim - 1) + sw.shape[1:])  # [G, 1.., C]
    return (xg * sw_b).sum(axis=0)


# re-export for convenience
quantize_int = primitives.quantize_int
dequantize_int = primitives.dequantize_int
asym_params = asymmetric_quant_params
