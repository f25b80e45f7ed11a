"""Mixed-precision attention core: quantized attention logits/probabilities
with timestep-dependent effective bit-width.

Functional rebuild of the reference `MixedPrecisionAttention` +
`AttentionCalibrator` (utils/attention_quant_utils.py:5-182):
- learned per-timestep importance (sigmoid-mapped to +0..2 bits over a base);
- attention logits quantized when effective bits <= 6 (at >= 4 bits);
- attention probabilities quantized when effective bits <= 4 (at >= 3 bits,
  unsigned — probs live in [0, 1]);
- a calibrator that runs forwards at probe timesteps and sets scale/zp from
  observed logit ranges.

State is an explicit pytree; the calibrator is a pure function over captured
logit statistics (no forward hooks).  Quantization uses unsigned
clamp-to-[0, 2^b-1] semantics as the reference does (its quantize_tensor,
attention_quant_utils.py:30-38), NOT the signed conv quantizer.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MPAttentionState:
    """Per-attention-layer mixed-precision state (a pytree)."""

    scale_qk: jax.Array  # [] logits quant scale
    zero_qk: jax.Array  # []
    scale_probs: jax.Array  # []
    zero_probs: jax.Array  # []
    timestep_importance: jax.Array  # [T] learned (init 0.5)
    softmax_scale: jax.Array  # [] learnable softmax temperature


def init_mp_attention_state(num_timesteps: int = 1000) -> MPAttentionState:
    return MPAttentionState(
        scale_qk=jnp.ones(()),
        zero_qk=jnp.zeros(()),
        scale_probs=jnp.ones(()),
        zero_probs=jnp.zeros(()),
        timestep_importance=jnp.full((num_timesteps,), 0.5),
        softmax_scale=jnp.ones(()),
    )


def effective_bits(state: MPAttentionState, base_bits: int, timestep):
    """base + 2*sigmoid(importance[t]) (attention_quant_utils.py:40-49).
    `timestep` is an integer scalar (or None -> base)."""
    if timestep is None:
        return jnp.asarray(float(base_bits))
    imp = state.timestep_importance[jnp.asarray(timestep, jnp.int32)]
    return base_bits + 2.0 * jax.nn.sigmoid(imp)


def quantize_unsigned(x, scale, zero_point, bits):
    """Unsigned [0, 2^bits - 1] quantize-dequantize; `bits` may be traced."""
    qmax = 2.0**bits - 1.0
    xq = jnp.clip(jnp.round(x / scale) + zero_point, 0.0, qmax)
    return (xq - zero_point) * scale


def mp_attention(
    q, k, v, state: MPAttentionState, *, num_heads: int, base_bits: int,
    timestep=None, head_split: str = "aligned"
):
    """Multi-head attention with conditionally quantized logits/probs.

    q: [B, L, C]; k: [B, C, L]; v: [B, L, Cv]; scaling = (C_qk)^-0.5 over
    the FULL projection dim (self_attention.py:69 passes key_channels**-0.5).
    Returns [B, L, Cv].

    D13 head-split decision: the reference splits q head-major but k
    channel-minor (attention_quant_utils.py:69-71 — `k.view(B, C//h, h, L)`),
    so head i attends q channels [i*d, (i+1)*d) against k channels
    {i, i+h, i+2h, ...}: every head pairs mismatched channel slices.  Fixed
    by default (`head_split="aligned"`, both head-major); pass
    `head_split="ref"` for bit-exact reference parity.
    """
    B, L, C = q.shape
    Cv = v.shape[-1]
    h = num_heads
    qh = q.reshape(B, L, h, C // h).transpose(0, 2, 1, 3)  # [B,h,L,d]
    if head_split == "aligned":
        kh = k.reshape(B, h, C // h, L)  # [B,h,d,L] — head-major like q
    elif head_split == "ref":
        kh = k.reshape(B, C // h, h, L).transpose(0, 2, 1, 3)  # [B,h,d,L], d-major quirk
    else:
        raise ValueError(f"head_split must be 'aligned' or 'ref', got {head_split!r}")
    vh = v.reshape(B, L, h, Cv // h).transpose(0, 2, 1, 3)  # [B,h,L,dv]

    bits = effective_bits(state, base_bits, timestep)
    scaling = C ** -0.5

    logits = jnp.einsum("bhld,bhdm->bhlm", qh, kh, preferred_element_type=jnp.float32)
    logits = logits * scaling

    # logits quantized at <= 6 effective bits, with >= 4-bit floor
    def quant_logits(x):
        b = jnp.maximum(4.0, jnp.floor(bits))
        return quantize_unsigned(x, state.scale_qk, state.zero_qk, b)

    logits = jnp.where(bits <= 6.0, quant_logits(logits), logits)

    probs = jax.nn.softmax(logits * state.softmax_scale, axis=-1)

    def quant_probs(p):
        b = jnp.maximum(3.0, jnp.floor(bits) - 1.0)
        return quantize_unsigned(p, state.scale_probs, state.zero_probs, b)

    probs = jnp.where(bits <= 4.0, quant_probs(probs), probs)

    out = jnp.einsum("bhlm,bhmd->bhld", probs, vh, preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, L, Cv)


def update_quant_params(
    state: MPAttentionState, qk_min, qk_max, base_bits: int
) -> MPAttentionState:
    """Set scale/zp from observed logit ranges; probs always span [0, 1]
    (attention_quant_utils.py:109-118)."""
    qk_range = qk_max - qk_min
    scale_qk = qk_range / (2.0**base_bits - 1.0)
    zero_qk = -qk_min / jnp.maximum(scale_qk, 1e-12)
    return MPAttentionState(
        scale_qk=jnp.asarray(scale_qk),
        zero_qk=jnp.asarray(zero_qk),
        scale_probs=jnp.asarray(1.0 / (2.0**base_bits - 1.0)),
        zero_probs=jnp.zeros(()),
        timestep_importance=state.timestep_importance,
        softmax_scale=state.softmax_scale,
    )


def make_logit_collector(params, cfg, x):
    """Build `collect_logits_fn(t)` for `calibrate_mp_attention`: one enhanced
    UNet forward at timestep t, returning per-attention-layer logit (min, max).
    Functional replacement for the reference's forward hooks
    (attention_quant_utils.py:149-172)."""
    import jax.numpy as jnp

    from ..models.unet import unet_apply

    def collect(t):
        stats: dict = {}
        n = x.shape[0]
        unet_apply(params, cfg, x, jnp.full((n,), float(t)), attn_ctx={"collect": stats})
        return stats

    return collect


def calibrate_mp_attention(
    collect_logits_fn,
    states: dict,
    base_bits: int,
    timesteps=(0, 250, 500, 750, 999),
):
    """Stage-3 calibration (runners/diffusion.py:480-509 +
    AttentionCalibrator.calibrate): run forwards at probe timesteps, gather
    per-layer attention-logit min/max, update each layer's quant params.

    `collect_logits_fn(t) -> {layer_name: (min, max)}` runs one model forward
    at timestep t, capturing logit stats functionally (the reference used
    forward hooks).
    """
    mins: dict = {}
    maxs: dict = {}
    for t in timesteps:
        stats = collect_logits_fn(t)
        for name, (mn, mx) in stats.items():
            mins[name] = jnp.minimum(mins[name], mn) if name in mins else jnp.asarray(mn)
            maxs[name] = jnp.maximum(maxs[name], mx) if name in maxs else jnp.asarray(mx)
    out = {}
    for name, st in states.items():
        if name in mins:
            out[name] = update_quant_params(st, mins[name], maxs[name], base_bits)
        else:
            out[name] = st
    return out
