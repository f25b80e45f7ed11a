"""Rank-1 (step-factorized) activation scales -> step-SHARED int8 folds.

The per-step serving fold exists because per-channel activation scales fold
into the weight operand of the integer GEMM (ops/quant_conv.py header): with
free per-(step, channel) scales s[t, c], the folded matrix g[t] = W / s[t]
requantizes per step, so the runtime stores S x params of int8 weights
(CIFAR DDIM-100: 3.5 GB; ImageNet64 DDIM-100: 30 GB -> must chunk, paying a
refold per chunk per call).

This module constrains the activation scales to a rank-1 factorization

    s'[t, c] = m[t] * u[c]

(log-space least squares onto the calibrated s[t, c], which is exact when the
per-channel range SHAPE is step-stationary and only its magnitude drifts
along the trajectory — empirically close for diffusion UNets).  Then

    g[t] = W / s'[t] = (W / u) / m[t]

and the symmetric per-output-channel weight grid is scale-invariant:
ws[t] = m[t] * ws_u gives IDENTICAL integer weights gq for every step.  The
fold stores gq once ([1, K, Np] — quant/int8_serving.gather_step treats a
singleton step axis as shared), per-step variation lives entirely in the
small dequant vectors (inv_ws [S, Np], zcbias [S, Np]) and the activation
quantizer (scale/zp [S, C]): fold HBM drops from S x params to params, fold
COMPUTE drops S-fold, and `--step_chunk` becomes unnecessary at any schedule
length.

Quality: the constraint costs per-(t, c) freedom in the quant window WIDTH
only (the window CENTER stays free via the re-centered zero point below); at
8-bit activations the width misfit is a fraction of an LSB in practice, and
the per-step fold refinement (quant/calibrate.refine_weight_extras) absorbs
any systematic residue into out_mult/bias_delta.  Measured via
tools/quality_protocol.py (PERFORMANCE.md).

Reference counterpart: none — the reference fake-quantizes and re-reads f32
weights every step (utils/quant_util.py:226-303), so it never faces the
folded-weight memory wall this removes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .state import ActQuantState, mixed_ranges


def _ranges_all(st: ActQuantState):
    """Per-step per-channel (rmin, rmax) [S, C] from the softmax mixture."""
    S = st.alpha_logits.shape[0]

    def at(s):
        return mixed_ranges(st, s)

    rmin, rmax = jax.vmap(at)(jnp.arange(S))
    return rmin, rmax


def rank1_factors(st: ActQuantState, a_bit: int):
    """Log-space least-squares rank-1 factorization of the effective scales.

    Returns (u [C], m [S]) with s'[t, c] = m[t] * u[c], normalized so that
    mean(log m) == 0 (u carries the magnitude; any per-layer scalar split is
    equivalent for the weight grid, which is scale-invariant).
    """
    rmin, rmax = _ranges_all(st)
    n_lv = 2**a_bit - 1
    s_tc = n_lv / jnp.maximum(rmax - rmin, 1e-12)  # [S, C]
    ls = jnp.log(jnp.maximum(s_tc, 1e-12))
    lu = ls.mean(axis=0)  # [C]
    lm = (ls - lu[None, :]).mean(axis=1)  # [S]
    return jnp.exp(lu), jnp.exp(lm)


def rank1_scale_zp(st: ActQuantState, a_bit: int, u: jax.Array, m: jax.Array):
    """Per-step activation quant params on the rank-1 scales.

    The window width is forced to n_lv / s'[t, c]; the zero point re-centers
    that window on the calibrated range's midpoint, so the fit error splits
    evenly between bottom and top clipping instead of all landing on one end.
    Returns (scale [S, C], zp [S, C]) — same contract as the per-step fold's
    `ranges_at` (q = round(scale * x - zp), x_hat = (q + zp) / scale).
    """
    rmin, rmax = _ranges_all(st)
    n_lv = 2**a_bit - 1
    scale = m[:, None] * u[None, :]  # [S, C]
    width = n_lv / scale
    center = 0.5 * (rmin + rmax)
    rmin_c = center - 0.5 * width
    zp = jnp.round(scale * rmin_c) + 2 ** (a_bit - 1)
    return scale, zp
