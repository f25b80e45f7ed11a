"""Serving-path int8 runtime: precomputed per-step folded weights.

After calibration the per-timestep quantization parameters are frozen, so
everything weight-side is precomputable: for each eligible conv and each
sampler step, fold the per-channel activation scales into the kernel and
quantize at w_bit (ops/quant_conv.fold_weights_int8).  The sampler scan then
only gathers `[step]` slices and runs int8 MACs — no per-step fold (which
costs more than the conv itself; measured 2x slowdown when done in-graph).

HBM cost: steps x params int8 (CIFAR-10 DDIM-100: ~3.5 GB).  For big models
or long schedules use the fused serving path instead —
quant/int8_serving.serving_ddim_sampler(step_chunk=k) folds lazily k steps
at a time (chunked == unchunked tested) — or fall back to mode="infer".
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from ..models.unet import conv2d, iter_conv_layers
from ..ops.quant_conv import (
    fold_shrink_search,
    fold_weights_int8,
    quantized_conv2d_int8_prefolded,
    zcorr_from_fold,
)
from .qunet import QuantizedUNet
from .state import ActQuantState, quantize_activation


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Int8Layer:
    gq: jax.Array  # [S, K, Np] int8
    ws: jax.Array  # [S, Np]
    wzp: jax.Array  # [S, Np]
    zcorr: jax.Array  # [S, Np]
    act_scale: jax.Array  # [S, C]
    act_zp: jax.Array  # [S, C]


def _eligible(kernel_shape, stride=1):
    kh, kw, ci, _ = kernel_shape
    return stride == 1 and ci >= 64 and (kh, kw) in ((1, 1), (3, 3))


import functools


@functools.partial(
    jax.jit, static_argnames=("a_bit", "w_bit", "symmetric", "mse_search", "rank1")
)
def _fold_all_steps(kernel, group_ranges, alpha_logits, a_bit: int, w_bit: int,
                    symmetric: bool = True, mse_search: bool = True,
                    round_offset=None, input_mu=None, shrink=None,
                    out_mult=None, bias_delta=None, rank1: bool = False):
    """Fold + quantize one conv's weights for every sampler step.

    jit-cached by (kernel shape, S, bits) so the ~6 distinct conv shapes in a
    UNet share compilations instead of one compile per conv (50 remote
    compiles would dwarf the fold itself).

    The MSE weight-range shrink is searched ONCE on the mean-over-steps
    activation scale and shared by every step: the per-channel optimum is
    insensitive to the smooth per-step scale drift, and an in-map search
    multiplies the fold graph ~20x (measured as minutes of extra remote
    compile + fold on the bench path).

    `round_offset` [kh, kw, C, co] in {0,1}: AdaRound decisions replacing
    round-to-nearest (quant/adaround.py), shared across steps like shrink.
    `input_mu` [kh*kw*C]: mean im2col input row; when given, each step's
    epilogue constant absorbs the bias correction mu^T (g - g_hat) that
    cancels the systematic weight-quantization output shift.

    `out_mult` [co] or [S, co] / `bias_delta` [co] or [S, co]:
    trajectory-distilled fold refinement (quant/calibrate.refine_weight_extras)
    — the decoded weight scales by out_mult per output channel (ws /= m, so
    the int8 grid is untouched) and the epilogue constant shifts by
    bias_delta; 2-D variants carry an independent correction per sampler
    step (the fold is per-step anyway, so this is runtime-free).

    `rank1=True` constrains the activation scales to the step-factorized
    rank-1 form s'[t, c] = m[t] * u[c] (quant/rank1.py) and quantizes the
    weights ONCE on the u grid: returns gq with a SINGLETON step axis
    ([1, K, Np] — step-shared; quant/int8_serving.gather_step broadcasts it)
    while the per-step dequant vectors and activation params stay [S, ...].
    Symmetric only (an asymmetric grid's rounded zero point breaks the
    scale-invariance that makes the shared fold exact)."""
    kh = kernel.shape[0]
    C = kernel.shape[2]
    co = kernel.shape[3]
    n_lv = 2**a_bit - 1

    def ranges_at(s):
        sw = jax.nn.softmax(alpha_logits[s], axis=0)  # [G, C]
        gr = group_ranges[s]
        rmin = (gr[:, 0:1] * sw).sum(axis=0)
        rmax = (gr[:, 1:2] * sw).sum(axis=0)
        scale = n_lv / (rmax - rmin)
        zp = jnp.round(scale * rmin) + 2 ** (a_bit - 1)
        return scale, zp

    S = alpha_logits.shape[0]
    if rank1:
        if not symmetric:
            raise NotImplementedError("rank1 shared folds require symmetric weights")
        from .rank1 import rank1_factors, rank1_scale_zp
        from .state import ActQuantState

        st = ActQuantState(
            init_range=jnp.zeros((S, 2), jnp.float32),
            act_min=jnp.zeros((S, C), jnp.float32),
            act_max=jnp.zeros((S, C), jnp.float32),
            group_ranges=group_ranges,
            alpha_logits=alpha_logits,
        )
        u, m = rank1_factors(st, a_bit)
        scale_all, zp_all = rank1_scale_zp(st, a_bit, u, m)  # [S, C]
        if shrink is None and mse_search:
            shrink = fold_shrink_search(kernel, u, w_bit, symmetric)
        elif shrink is None:
            shrink = jnp.ones((co,), kernel.dtype)
        gq_u, ws_u, _wzp_u, g_hat_u = fold_weights_int8(
            kernel, u, w_bit, symmetric=True, shrink=shrink,
            round_offset=round_offset,
        )
        Np = gq_u.shape[-1]

        def per_step_consts(s):
            ws_s = ws_u * m[s]
            g_hat_s = g_hat_u / m[s]
            if out_mult is not None:
                om = out_mult if out_mult.ndim == 1 else out_mult[s]
                mpad = jnp.pad(om.astype(ws_s.dtype), (0, Np - co), constant_values=1.0)
                ws_s = ws_s / mpad
                g_hat_s = g_hat_s * mpad[None, :]
            zc = zcorr_from_fold(g_hat_s, zp_all[s], kh, C)
            if input_mu is not None:
                g = (kernel / (scale_all[s]).reshape(1, 1, C, 1)).reshape(kh * kh * C, co)
                Cp = g_hat_s.shape[0] // (kh * kh)
                gh = g_hat_s.reshape(kh * kh, Cp, -1)[:, :C, :co].reshape(kh * kh * C, co)
                corr = input_mu @ (g - gh)
                zc = zc.at[:co].add(corr)
            if bias_delta is not None:
                bd = bias_delta if bias_delta.ndim == 1 else bias_delta[s]
                zc = zc.at[:co].add(bd.astype(zc.dtype))
            return ws_s, jnp.zeros_like(ws_s), zc

        ws, wzp, zc = jax.vmap(per_step_consts)(jnp.arange(S))
        return gq_u[None], ws, wzp, zc, scale_all, zp_all
    if shrink is not None:
        pass  # pinned shrink from WeightExtras: the grid AdaRound/stage-2 saw
    elif mse_search:
        all_scales, _ = jax.vmap(ranges_at)(jnp.arange(S))  # [S, C]
        shrink = fold_shrink_search(kernel, all_scales.mean(axis=0), w_bit, symmetric)
    else:
        shrink = jnp.ones((kernel.shape[3],), kernel.dtype)

    def per_step(s):
        scale, zp = ranges_at(s)
        gq, ws, wzp, g_hat = fold_weights_int8(
            kernel, scale, w_bit, symmetric=symmetric, shrink=shrink,
            round_offset=round_offset,
        )
        if out_mult is not None:
            om = out_mult if out_mult.ndim == 1 else out_mult[s]
            mpad = jnp.pad(om.astype(ws.dtype), (0, ws.shape[0] - co),
                           constant_values=1.0)
            ws = ws / mpad
            g_hat = g_hat * mpad[None, :]
        zc = zcorr_from_fold(g_hat, zp, kh, C)
        if input_mu is not None:
            # bias correction: + mu^T (g - g_hat) on the unpadded rows
            g = (kernel / scale.reshape(1, 1, C, 1)).reshape(kh * kh * C, co)
            Cp = g_hat.shape[0] // (kh * kh)
            gh = g_hat.reshape(kh * kh, Cp, -1)[:, :C, :co].reshape(kh * kh * C, co)
            corr = input_mu @ (g - gh)  # [co]
            zc = zc.at[:co].add(corr)
        if bias_delta is not None:
            bd = bias_delta if bias_delta.ndim == 1 else bias_delta[s]
            zc = zc.at[:co].add(bd.astype(zc.dtype))
        return gq, ws, wzp, zc, scale, zp

    return jax.lax.map(per_step, jnp.arange(S))


def prepare_int8_runtime(
    qunet: QuantizedUNet,
    params,
    qstates: Dict[str, ActQuantState],
    symmetric: bool = True,
    mse_search: bool = True,
    weight_extras=None,
) -> Dict[str, Int8Layer]:
    """Fold + quantize weights for every step of every eligible conv.

    `symmetric` (default) uses zero-point-free weight quantization — the
    epilogue drops its rowsum term (faster; sub-half-bit range cost on
    near-symmetric conv weights).

    `weight_extras` {name: WeightExtras} (quant/adaround.py) supplies
    AdaRound offsets and/or bias-correction means per layer."""
    runtime: Dict[str, Int8Layer] = {}
    for name, _cin, _k in iter_conv_layers(qunet.cfg):
        node = params
        for p in name.split("."):
            node = node[int(p)] if isinstance(node, list) else node[p]
        kernel = node["kernel"]
        if not _eligible(kernel.shape):
            continue
        st = qstates[name]
        pol = qunet.policy[name]
        ex = weight_extras.get(name) if weight_extras else None
        gq, ws, wzp, zc, scale, zp = _fold_all_steps(
            kernel, st.group_ranges, st.alpha_logits, pol.a_bit, pol.w_bit,
            symmetric, mse_search,
            round_offset=None if ex is None else ex.round_offset,
            input_mu=None if ex is None else ex.mu,
            shrink=None if ex is None else ex.shrink,
            out_mult=None if ex is None else ex.out_mult,
            bias_delta=None if ex is None else ex.bias_delta,
        )
        runtime[name] = Int8Layer(gq=gq, ws=ws, wzp=wzp, zcorr=zc, act_scale=scale, act_zp=zp)
    return runtime


def make_int8_conv_apply(
    runtime: Dict[str, Int8Layer],
    qunet: QuantizedUNet,
    qstates: Dict[str, ActQuantState],
    step_idx,
    symmetric: bool = True,
):
    """Conv interceptor: int8 kernels for covered layers; non-eligible convs
    (conv_in/conv_out with 3 channels, strided downsample) run fake-quant
    activations with full-precision weights — the standard PTQ policy of
    keeping first/last layers high precision.  Pass RAW params."""

    def conv_apply(name, x, p, *, stride=1, padding="SAME"):
        rt = runtime.get(name)
        pol = qunet.policy.get(name)
        if rt is not None and stride == 1:
            kh = p["kernel"].shape[0]
            co = p["kernel"].shape[3]
            return quantized_conv2d_int8_prefolded(
                x.astype(jnp.float32),
                rt.gq[step_idx],
                rt.ws[step_idx],
                rt.wzp[step_idx],
                rt.zcorr[step_idx],
                p["bias"].astype(jnp.float32),
                rt.act_scale[step_idx],
                rt.act_zp[step_idx],
                pol.a_bit,
                kh,
                co,
                symmetric=symmetric,
            ).astype(x.dtype)
        if pol is not None and name in qstates:
            xq = quantize_activation(x.astype(jnp.float32), qstates[name], step_idx, pol.a_bit)
            return conv2d(xq.astype(p["kernel"].dtype), p, stride=stride, padding=padding)
        return conv2d(x, p, stride=stride, padding=padding)

    return conv_apply


def int8_model_fn(qunet: QuantizedUNet, runtime, params, qstates, symmetric: bool = True):
    """Sampler-compatible closure running the precomputed int8 path.
    Pass RAW (unquantized) params — eligible convs use the folded int8
    weights from `runtime`; the few fallback layers keep FP weights."""
    from ..models.unet import unet_apply

    def fn(x, t, step_idx):
        ca = make_int8_conv_apply(runtime, qunet, qstates, step_idx, symmetric=symmetric)
        return unet_apply(params, qunet.cfg, x, t, conv_apply=ca)

    return fn
