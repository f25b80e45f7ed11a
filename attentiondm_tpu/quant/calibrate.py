"""Calibration pipeline as scanned/jitted XLA programs.

Functional rebuild of the reference's calibration machinery:

- Stage 1 ("general"): per-timestep, per-channel range collection with the
  LAPQ 9-candidate grid search (quant_util.py:237-254, citing
  arXiv:1911.07190) and group-wise range bucketing (403-437).  The reference
  calls a `calibrate_general` that was never written (defect D2); this is the
  implementation of its evident intent.
- Stage 2: differentiable group-selection — optimize `alpha_logits` along the
  sampler trajectory with an entropy regularizer, optionally restricted to
  attention projections (functions/denoising.py:62-116 `generalized_steps_loss`
  + runners/diffusion.py:266-306 `calibrate_attention`).
- Calibration-set generation with all four `calib_t_mode`s, including the
  entropy-driven `diff` active-timestep selection
  (runners/diffusion.py:198-264).

Everything is pure: quant state goes in, updated quant state comes out; the
timestep index is an explicit argument (kills the global `seq` counter,
defect D11).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.unet import unet_apply, conv2d
from ..diffusion.sampling import _seq_alphas, ddim_step
from ..ops.quant_conv import weight_grid
from .groupwise import groupwise_ranges
from .primitives import lp_loss
from .state import ActQuantConfig, ActQuantState, quantize_activation_mixture
from .qunet import QuantizedUNet

LAPQ_CANDIDATES = 9
LAPQ_ACCEPT_SCORE = 0.2
# Assignment-init logit magnitude: softmax weight on the channel's own
# bucket ~= 1/(1+(G-1)e^-K) = 0.9992 at G=8, K=9 — effectively one-hot while
# staying differentiable for stage 2.
ASSIGN_LOGIT = 9.0


# ---------------------------------------------------------------------------
# Stage 1: range calibration (LAPQ grid + group-wise bucketing)
# ---------------------------------------------------------------------------


def _assignment_logits(gr, snap_min, snap_max, scale: float = ASSIGN_LOGIT):
    """One-hot(ish) logits putting each channel on its OWN bucket.

    The reference computes the per-channel group assignment (the snapped
    ranges, quant_util.py:198-201) but leaves `alpha_activ` at its uniform
    0.01 init — so the inference mixture (260-267) collapses every channel
    to the MEAN of the 8 group thresholds and the group structure is unused
    until stage 2 learns it.  This seeds the mixture with the computed
    assignment instead.  Measured (tools/quality_protocol.py): NOT an
    improvement — the LAPQ range floor (init [-4, 6]) dominates the
    per-bucket thresholds, so own-bucket ranges are wider than the uniform
    mean and rounding error rises more than clipping falls.  Kept as an
    opt-in for studies; the default stays reference-faithful uniform.
    """
    d = jnp.abs(gr[:, 0:1] - snap_min[None, :]) + jnp.abs(gr[:, 1:2] - snap_max[None, :])
    own = jnp.argmin(d, axis=0)  # [C]
    return jax.nn.one_hot(own, gr.shape[0], axis=0) * scale  # [G, C]


def _calibrate_one_conv(
    x, st: ActQuantState, cfg: ActQuantConfig, s, first: bool, assignment: bool = False
):
    """Calibrate one conv's quant state at step `s` from its input `x`.

    Returns (updated fields, quantized activation to propagate downstream).
    """
    axes = tuple(range(x.ndim - 1))
    chan_min = x.min(axis=axes)  # [C]
    chan_max = x.max(axis=axes)
    G = cfg.group_num

    def build(base_min, base_max):
        # range floor: every channel at least [base_min, base_max]
        # (reference quant_util.py:193-196)
        cmin = jnp.minimum(chan_min, base_min)
        cmax = jnp.maximum(chan_max, base_max)
        snap_min, gmin = groupwise_ranges(cmin, G, "min")
        snap_max, gmax = groupwise_ranges(cmax, G, "max")
        gr = jnp.stack([gmin, gmax], axis=1)  # [G, 2]
        alpha = (
            _assignment_logits(gr, snap_min, snap_max)
            if assignment
            else st.alpha_logits[s]
        )
        return snap_min, snap_max, gr, alpha

    init_min = st.init_range[s, 0]
    init_max = st.init_range[s, 1]

    if first:
        # LAPQ: evaluate 9 shrink factors of the base range, keep the best
        # under L_0.5 reconstruction loss (quant_util.py:237-254).
        def score_candidate(aa):
            bm = init_min * (1.0 - aa * 0.1)
            bM = init_max * (1.0 - aa * 0.1)
            _, _, gr, alpha = build(bm, bM)
            xq = quantize_activation_mixture(x, gr, alpha, cfg.a_bit)
            return lp_loss(xq, x, p=0.5, reduction="all")

        scores = jax.vmap(score_candidate)(jnp.arange(LAPQ_CANDIDATES, dtype=jnp.float32))
        best = jnp.argmin(scores)
        best_score = scores[best]
        shrink = 1.0 - best.astype(jnp.float32) * 0.1
        accept = best_score < LAPQ_ACCEPT_SCORE
        init_min = jnp.where(accept, init_min * shrink, init_min)
        init_max = jnp.where(accept, init_max * shrink, init_max)

    snap_min, snap_max, gr, alpha = build(init_min, init_max)
    xq = quantize_activation_mixture(x, gr, alpha, cfg.a_bit)
    updates = dict(
        init_range=jnp.stack([init_min, init_max]),
        act_min=snap_min,
        act_max=snap_max,
        group_ranges=gr,
        alpha_logits=alpha,
    )
    return updates, xq


def _is_attn_proj(name: str) -> bool:
    leaf = name.rsplit(".", 1)[-1]
    return (".attn" in name or name.startswith("mid.attn")) and leaf in ("q", "k", "v")


def calibrate_ranges_step(
    qunet: QuantizedUNet,
    params,
    qstates: Dict[str, ActQuantState],
    x,
    t,
    s,
    first: bool,
    assignment: bool = False,
):
    """One calibration forward at step `s`: collect + update every conv's
    ranges; activations propagate QUANTIZED (as the reference does).

    Also records each attention q/k/v projection's OUTPUT absmax — the
    static per-step scales the int8 QK^T serving path quantizes with
    (ops/int8_attention.fused_int8_attention_static)."""
    updates: dict = {}
    attn_absmax: dict = {}

    def conv_apply(name, xin, p, *, stride=1, padding="SAME"):
        if name not in qstates:
            return conv2d(xin, p, stride=stride, padding=padding)
        upd, xq = _calibrate_one_conv(
            xin, qstates[name], qunet.policy[name], s, first, assignment
        )
        updates[name] = upd
        out = conv2d(xq, p, stride=stride, padding=padding)
        if _is_attn_proj(name):
            attn_absmax[name] = jnp.abs(out).max()
        return out

    eps = unet_apply(params, qunet.cfg, x, t, conv_apply=conv_apply)

    new_states = {}
    for name, st in qstates.items():
        u = updates[name]
        new_states[name] = ActQuantState(
            init_range=st.init_range.at[s].set(u["init_range"]),
            act_min=st.act_min.at[s].set(u["act_min"]),
            act_max=st.act_max.at[s].set(u["act_max"]),
            group_ranges=st.group_ranges.at[s].set(u["group_ranges"]),
            alpha_logits=st.alpha_logits.at[s].set(u["alpha_logits"]),
        )
    return new_states, attn_absmax, eps


def calibrate_ranges(
    qunet: QuantizedUNet,
    params,
    qstates: Dict[str, ActQuantState],
    xs: jax.Array,  # [S, N, H, W, C] trajectory inputs (FP teacher x_t per step)
    seq: Sequence[int],
    first: bool = True,
    return_attn_ranges: bool = False,
    assignment_init: bool = False,
):
    """Stage-1 calibration over the whole sampler trajectory.

    `xs[i]` must be the model input at sampling step i (i.e. x_t for
    t = reversed(seq)[i]).  One jitted step function, reused S times.

    With `return_attn_ranges` also returns {proj_name: [S]} absmax of each
    attention q/k/v projection output per step — the static scales for the
    int8 QK^T serving attention.

    `assignment_init` seeds `alpha_logits` with each channel's own bucket
    (see `_assignment_logits`); False keeps the reference-faithful uniform
    init (quant_util.py:119-120), which collapses the inference mixture to
    the mean of the group thresholds until stage 2 learns otherwise.
    """
    t_rev = np.asarray(list(seq))[::-1].astype(np.float32)
    S, n = xs.shape[0], xs.shape[1]

    # One on-device lax.scan over the trajectory: the per-step python loop
    # cost S relay round-trips (~0.5 s each through the axon tunnel — the
    # bulk of the measured 83 s stage-1); params stay jit ARGUMENTS (closure
    # constants become HLO literals and overflow remote-compile payload
    # limits on big models).
    @jax.jit
    def run(p, qs0, xs_, ts_):
        def body(qs, inp):
            x, t_i, s = inp
            t_vec = jnp.full((n,), t_i, jnp.float32)
            new_qs, absmax, _ = calibrate_ranges_step(
                qunet, p, qs, x, t_vec, s, first, assignment_init
            )
            return new_qs, absmax

        idxs = jnp.arange(S)
        return jax.lax.scan(body, qs0, (xs_, jnp.asarray(ts_), idxs))

    qstates, attn_ranges = run(params, qstates, xs, t_rev)
    if not return_attn_ranges:
        return qstates
    return qstates, attn_ranges


# ---------------------------------------------------------------------------
# Stage 2: differentiable group-selection along the trajectory
# ---------------------------------------------------------------------------


def _alpha_entropy(alpha_logits_s, g, c):
    """The reference's (pseudo-)entropy regularizer: softmax over groups,
    -sum(p log p) over channels, mean over groups, / (G*C)
    (functions/denoising.py:13-14, 89-97)."""
    p = jax.nn.softmax(alpha_logits_s, axis=0)
    ent = -(p * jnp.log(p + 1e-12)).sum(axis=-1).mean()
    return ent / (g * c)


def calibrate_differentiable(
    qunet: QuantizedUNet,
    params,
    qstates: Dict[str, ActQuantState],
    x0: jax.Array,  # calibration images, NHWC, in [-1, 1]
    seq: Sequence[int],
    betas: jax.Array,
    *,
    key: jax.Array,
    eta: float = 0.0,
    lr: float = 0.05,
    weight_decay: float = 0.05,
    diff_loss_weight: float = 1.0,
    attention_focus: bool = False,
    epochs: int = 1,
):
    """Optimize alpha_logits with AdamW along the DDIM trajectory.

    Mirrors `generalized_steps_loss` (denoising.py:62-116): at each step,
    loss = eps-MSE (with fresh noise, on the current x_t treated as x0) +
    diff_loss_weight * sum of alpha entropies at this step; one optimizer
    step per timestep; x advances by the DDIM update using the loss
    forward's eps prediction.

    `epochs` repeats the trajectory pass (fresh noise, same x0, optimizer
    state carried over).  The reference's single pass gives each step's
    alpha slice exactly ONE AdamW update (lr 0.05 moves the logits ~0.05,
    a ~1% softmax shift) — measured quality-neutral; multiple epochs give
    the differentiable search an actual chance to move the mixture.
    """
    sel_names = [
        n
        for n in qstates
        if (not attention_focus) or (".attn" in n or n.startswith("mid.attn"))
    ]
    t_rev, _, at_all, at_next_all = _seq_alphas(betas, seq)
    S = len(list(seq))
    n = x0.shape[0]

    opt = optax.adamw(lr, weight_decay=weight_decay)
    alpha0 = {n_: qstates[n_].alpha_logits for n_ in sel_names}
    opt_state = opt.init(alpha0)

    abar = jnp.cumprod(1.0 - betas)

    def set_alphas(qs, alphas):
        out = dict(qs)
        for n_, a in alphas.items():
            st = qs[n_]
            out[n_] = ActQuantState(
                init_range=st.init_range,
                act_min=st.act_min,
                act_max=st.act_max,
                group_ranges=st.group_ranges,
                alpha_logits=a,
            )
        return out

    # One lax.scan per epoch (the reference's per-timestep optimizer.step,
    # denoising.py:111-113, as a single on-device program — the python loop
    # cost S relay round-trips, the bulk of the measured 105 s stage-2)
    @jax.jit
    def run_epoch(p, base_qstates, alphas, opt_state, x0_, keys):
        def body(carry, inp):
            alphas, opt_state, xt = carry
            s, t_i, at, at_next, k = inp

            def loss_fn(alphas_):
                qs = set_alphas(base_qstates, alphas_)
                # the reference noises the CURRENT x_t as if it were x0,
                # at level t_i, with fresh noise
                e = jax.random.normal(k, xt.shape, xt.dtype)
                a = abar[jnp.asarray(t_i, jnp.int32)]
                x_noised = xt * jnp.sqrt(a) + e * jnp.sqrt(1.0 - a)
                t_vec = jnp.full((n,), t_i, jnp.float32)
                et = qunet.apply(p, qs, x_noised, t_vec, s, mode="mixture")
                mse = jnp.square(e - et).sum(axis=(1, 2, 3)).mean()
                ent = 0.0
                for n_ in sel_names:
                    g, c = alphas_[n_].shape[1], alphas_[n_].shape[2]
                    ent = ent + _alpha_entropy(alphas_[n_][s], g, c)
                return mse + diff_loss_weight * ent, et

            (loss, et), grads = jax.value_and_grad(loss_fn, has_aux=True)(alphas)
            upd, opt_state = opt.update(grads, opt_state, alphas)
            alphas = optax.apply_updates(alphas, upd)
            xt_next, _ = ddim_step(xt, et, at, at_next, eta, jnp.zeros_like(xt))
            return (alphas, opt_state, xt_next), loss

        idxs = jnp.arange(S)
        t_f = jnp.asarray(t_rev, jnp.float32)
        (alphas, opt_state, _xt), losses = jax.lax.scan(
            body, (alphas, opt_state, x0_), (idxs, t_f, at_all, at_next_all, keys)
        )
        return alphas, opt_state, losses

    alphas = alpha0
    losses: list = []
    for ep in range(epochs):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(ep * S, (ep + 1) * S)
        )
        alphas, opt_state, ep_losses = run_epoch(
            params, qstates, alphas, opt_state, x0, keys
        )
        losses.extend(float(v) for v in np.asarray(ep_losses))
    return set_alphas(qstates, alphas), losses


# ---------------------------------------------------------------------------
# Serving-fold surrogate: a differentiable float forward with EXACTLY the
# serving engine's quantization semantics (round-3).
#
# The plain teacher-matched stage 2 optimizes ranges against the fake-quant
# model — whose weight grid (asymmetric, raw-weight) differs from the serving
# fold (symmetric, activation-scale-folded, AdaRound offsets, pinned shrink).
# Measured consequence: ranges tuned on the fake-quant grid HURT the deployed
# serving quality (quality_r3: _ar 19.6 dB vs _ar_s12t 17.2 dB).  This
# surrogate reproduces the serving fold inside the loss — fake-quant
# activations on the softmax-mixed ranges AND per-step weight requantization
# g_hat = (clip(floor(ws*g - wzp) + h) + wzp)/ws with the pinned shrink and
# fixed AdaRound offsets — with STE through every rounding, so gradients
# reach alpha_logits / rho through both the activation grid and the fold.
# ---------------------------------------------------------------------------


def serving_surrogate_apply(
    qunet: QuantizedUNet,
    params,  # RAW params (the serving engine folds raw kernels)
    qstates: Dict[str, ActQuantState],
    weight_extras,
    x,
    t,
    s,
    *,
    symmetric: bool = True,
    rank1: bool = False,
):
    """Differentiable forward matching quant/int8_serving's numerics.

    Eligible convs run conv(x_hat, W_hat_s) where x_hat is the STE fake-quant
    at the step's mixed ranges and W_hat_s = g_hat_s * act_scale (the decoded
    per-step fold, ops/quant_conv.fold_weights_int8 semantics incl. AdaRound
    offsets, pinned shrink, and the bias-correction term).  Ineligible convs
    follow the serving fallback (fake-quant act, raw weights).

    `rank1` mirrors the step-SHARED fold (quant/rank1.py +
    int8_runtime._fold_all_steps rank1 branch): eligible convs quantize
    activations at the rank-1 scales with re-centered zero points and the
    weight grid anchors on the step-independent u factor, so parameters
    optimized through this surrogate transfer 1:1 to the shared-fold serving
    engine.
    """
    from ..quant.primitives import ste_floor, ste_round
    from .int8_runtime import _eligible
    from .rank1 import rank1_factors, rank1_scale_zp
    from .state import mixed_ranges

    def conv_apply(name, xin, p, *, stride=1, padding="SAME"):
        if name not in qstates:
            return conv2d(xin, p, stride=stride, padding=padding)
        st = qstates[name]
        pol = qunet.policy[name]
        xf = xin.astype(jnp.float32)
        kernel = p["kernel"].astype(jnp.float32)
        n_lv = 2**pol.a_bit - 1
        na = 2 ** (pol.a_bit - 1)
        eligible = stride == 1 and _eligible(kernel.shape)
        u = mfac = None
        if rank1 and eligible:
            u, mfac = rank1_factors(st, pol.a_bit)
            scale_all, zp_all = rank1_scale_zp(st, pol.a_bit, u, mfac)
            scale, zp = scale_all[s], zp_all[s]
        else:
            rmin, rmax = mixed_ranges(st, s)
            scale = n_lv / (rmax - rmin)
            zp = jnp.round(scale * rmin) + na
        q = jnp.clip(ste_round(scale * xf - zp), -na, na - 1)
        x_hat = (q + zp) / scale

        ex = weight_extras.get(name) if weight_extras else None
        if not eligible or ex is None or ex.shrink is None:
            return conv2d(x_hat, p, stride=stride, padding=padding)

        kh, kw, ci, co = kernel.shape
        grid_scale = u if u is not None else scale
        g = kernel / grid_scale.reshape(1, 1, ci, 1)
        nw = 2 ** (pol.w_bit - 1)
        # the one true grid (ops/quant_conv.weight_grid), differentiably
        ws, wzp = weight_grid(g, pol.w_bit, symmetric, ex.shrink)
        base = ws * g - wzp
        if ex.round_offset is not None:
            gq = jnp.clip(ste_floor(base) + ex.round_offset, -nw, nw - 1)
        else:
            gq = jnp.clip(ste_round(base), -nw, nw - 1)
        g_hat = (gq + wzp) / ws
        if mfac is not None:
            g_hat = g_hat / mfac[s]  # shared grid decodes at step s
        if ex.out_mult is not None:
            om = ex.out_mult if ex.out_mult.ndim == 1 else ex.out_mult[s]
            g_hat = g_hat * om
        w_hat = g_hat * scale.reshape(1, 1, ci, 1)
        if ex.bias_delta is None:
            bias = p["bias"]
        else:
            bd = ex.bias_delta if ex.bias_delta.ndim == 1 else ex.bias_delta[s]
            bias = p["bias"] + bd
        out = conv2d(x_hat, {"kernel": w_hat, "bias": bias}, stride=stride, padding=padding)
        if ex.mu is not None:
            g_step = kernel / scale.reshape(1, 1, ci, 1)
            corr = ex.mu @ (g_step.reshape(kh * kw * ci, co) - g_hat.reshape(kh * kw * ci, co))
            out = out + corr
        return out

    return unet_apply(params, qunet.cfg, x, t, conv_apply=conv_apply)


# ---------------------------------------------------------------------------
# Stage 2, teacher-matched variant (round-3 addition, VERDICT r2 item 2)
# ---------------------------------------------------------------------------


def calibrate_teacher_matched(
    qunet: QuantizedUNet,
    forward_params,
    qstates: Dict[str, ActQuantState],
    xs_in: jax.Array,  # [S, N, H, W, C] FP teacher trajectory model inputs
    eps_ref: jax.Array,  # [S, N, H, W, C] FP teacher eps predictions
    seq: Sequence[int],
    *,
    lr: float = 0.01,
    epochs: int = 4,
    attention_focus: bool = False,
    train_alpha: bool = True,
    train_range_scale: bool = True,
    serving_extras=None,
    symmetric: bool = True,
    rank1: bool = False,
):
    """Distillation-objective stage 2: optimize the activation-quantization
    parameters to minimize ||eps_q - eps_fp32||^2 on the teacher's OWN
    trajectory — the exact quantity the quality protocol scores.

    The reference's stage 2 (fresh-noise MSE + entropy, denoising.py:62-116)
    was measured quality-neutral (PERFORMANCE.md); this mode replaces its
    objective, not its machinery: same per-timestep optimizer steps along the
    trajectory, but (a) the loss is the per-step relative eps error against
    precomputed FP32 teacher outputs, (b) the forward runs the *inference*
    path (softmax-mixed ranges + STE fake-quant) so the learned parameters
    transfer 1:1 to the serving fold (quant/int8_runtime._fold_all_steps
    derives its act scales from the same mixed ranges), and (c) besides
    `alpha_logits` it can learn a per-layer per-step log range-scale `rho`
    (group_ranges * exp(rho[s])) — a direct clipping-vs-rounding knob the
    alpha mixture cannot express.

    `forward_params` should be the weight-quantized params (prepare_params)
    so the objective sees deployment weights — UNLESS `serving_extras` is
    given: then the loss forward is `serving_surrogate_apply` (the serving
    fold's exact quantization semantics, AdaRound offsets + pinned shrinks
    from the extras) and `forward_params` must be the RAW params.  Returns
    (qstates', losses).
    """
    sel_names = [
        n
        for n in qstates
        if (not attention_focus) or (".attn" in n or n.startswith("mid.attn"))
    ]
    t_rev = np.asarray(list(seq))[::-1].astype(np.float32)
    S, n = xs_in.shape[0], xs_in.shape[1]

    theta0 = {}
    if train_alpha:
        theta0["alpha"] = {n_: qstates[n_].alpha_logits for n_ in sel_names}
    if train_range_scale:
        theta0["rho"] = {n_: jnp.zeros((S,), jnp.float32) for n_ in sel_names}
    if not theta0:
        return qstates, []

    opt = optax.adam(lr)
    opt_state = opt.init(theta0)

    def apply_theta(qs, theta):
        out = dict(qs)
        for n_ in sel_names:
            st = out[n_]
            alpha = theta["alpha"][n_] if "alpha" in theta else st.alpha_logits
            gr = st.group_ranges
            if "rho" in theta:
                gr = gr * jnp.exp(theta["rho"][n_])[:, None, None]
            out[n_] = ActQuantState(
                init_range=st.init_range,
                act_min=st.act_min,
                act_max=st.act_max,
                group_ranges=gr,
                alpha_logits=alpha,
            )
        return out

    use_extras = serving_extras is not None  # static: picks the loss forward

    # NOTE: extras_ rides through jit as an ARGUMENT — round_offset is
    # kernel-shaped per conv, and closure-captured pytrees become HLO
    # literals that blow the remote-compile payload limit on CelebA+ models
    # (CLAUDE.md / PERFORMANCE.md "Measurement methodology")
    @jax.jit
    def run_epoch(p, base_qstates, extras_, theta, opt_state, best_theta,
                  best_loss, xs_, eref_):
        def body(carry, inp):
            theta, opt_state, best_theta, best_loss = carry
            s, t_i, x_s, e_s = inp

            def loss_fn(th):
                qs = apply_theta(base_qstates, th)
                t_vec = jnp.full((n,), t_i, jnp.float32)
                if use_extras:
                    et = serving_surrogate_apply(
                        qunet, p, qs, extras_, x_s, t_vec, s,
                        symmetric=symmetric, rank1=rank1,
                    )
                else:
                    et = qunet.apply(p, qs, x_s, t_vec, s, mode="infer")
                return jnp.mean(jnp.square(et - e_s)) / jnp.mean(jnp.square(e_s))

            loss, grads = jax.value_and_grad(loss_fn)(theta)
            # per-step best-iterate selection: slice s of the optimization is
            # independent of every other step, and STE through the fold makes
            # the objective non-monotone under Adam (requantization cliffs) —
            # keep whichever evaluated iterate scored best, so the result can
            # never be worse than stage 1 on the objective (epoch 1 evaluates
            # the unmodified init first).
            better = loss < best_loss[s]
            best_theta = jax.tree_util.tree_map(
                lambda b, c: b.at[s].set(jnp.where(better, c[s], b[s])), best_theta, theta
            )
            best_loss = best_loss.at[s].set(jnp.minimum(best_loss[s], loss))
            upd, opt_state = opt.update(grads, opt_state)
            theta = optax.apply_updates(theta, upd)
            return (theta, opt_state, best_theta, best_loss), loss

        idxs = jnp.arange(S)
        (theta, opt_state, best_theta, best_loss), losses = jax.lax.scan(
            body, (theta, opt_state, best_theta, best_loss),
            (idxs, jnp.asarray(t_rev), xs_, eref_),
        )
        return theta, opt_state, best_theta, best_loss, losses

    theta = theta0
    best_theta = jax.tree_util.tree_map(lambda a: a, theta0)
    best_loss = jnp.full((S,), jnp.inf, jnp.float32)
    losses: list = []
    for _ep in range(epochs):
        theta, opt_state, best_theta, best_loss, ep_losses = run_epoch(
            forward_params, qstates, serving_extras, theta, opt_state,
            best_theta, best_loss, xs_in, eps_ref,
        )
        losses.extend(float(v) for v in np.asarray(ep_losses))
    return apply_theta(qstates, best_theta), losses


# ---------------------------------------------------------------------------
# Stage 3: trajectory-distilled fold refinement (round-3 W4 quality lever)
# ---------------------------------------------------------------------------


def refine_weight_extras(
    qunet: QuantizedUNet,
    params,  # RAW params (the surrogate folds raw kernels)
    qstates: Dict[str, ActQuantState],
    extras,  # {name: WeightExtras} from compute_weight_extras
    xs_in: jax.Array,  # [S, N, H, W, C] FP teacher trajectory model inputs
    eps_ref: jax.Array,  # [S, N, H, W, C] FP teacher eps predictions
    seq: Sequence[int],
    *,
    lr: float | None = None,
    epochs: int = 8,
    train_mult: bool = True,
    train_bias: bool = True,
    symmetric: bool = True,
    rank1: bool = False,
    per_step: bool = False,
    inner: int = 24,
    chunk: int | None = None,
):
    """Optimize the fold's FREE per-output-channel parameters — decoded-weight
    multiplier `out_mult` and bias shift `bias_delta` (WeightExtras) — to
    minimize the per-step relative eps error against the FP32 teacher on its
    own trajectory, through the exact-fold surrogate.

    Rationale: at W4 the per-step eps error is near the W8 level but the
    free-run trajectory collapses (quality_r3: rel-MSE 0.0077 vs 0.0065 yet
    19.6 vs 30.8 dB) — the residual weight error is *systematic*, so it
    compounds over the sampler.  AdaRound minimizes each layer's local output
    MSE; this stage re-aims the two knobs the serving fold can absorb for
    free (they land in `inv_ws`/`zcbias`, zero runtime cost) at the network's
    end-to-end objective.  Gradients for a layer's own mult/bias are exact
    (they act after the int8 accumulator); cross-layer effects flow via STE.

    Two modes:

    - ``per_step=False``: one [co] correction per layer shared across sampler
      steps, trained `epochs` passes over the trajectory (one Adam update per
      step visit) with epoch-level best-iterate selection.
    - ``per_step=True``: an independent [S, co] correction per layer — the
      fold bakes per-step constants anyway, so the extra expressiveness is
      runtime-free.  Steps are independent given the teacher trajectory, so
      each step's slice is solved by its own `inner`-iteration Adam run;
      steps are processed `chunk` at a time under vmap to batch the tiny
      per-step forwards onto the MXU.  Best-iterate selection per chunk
      guarantees the result is never worse than the init on the surrogate
      objective.

    Returns (extras', losses): per-epoch mean losses (entry 0 = init) in the
    shared mode; [n_chunks, inner+1] per-chunk loss traces in per-step mode
    (column 0 = init).
    """
    import dataclasses as _dc

    if lr is None:
        # measured: per-step chunks converge well at 5e-3 in ~24 inner
        # iterations; the shared mode (one update per step visit) wants the
        # gentler 2e-3
        lr = 5e-3 if per_step else 2e-3
    t_rev = np.asarray(list(seq))[::-1].astype(np.float32)
    S, n = xs_in.shape[0], xs_in.shape[1]
    sel = [nm for nm, ex in extras.items() if ex.shrink is not None]
    if not sel or not (train_mult or train_bias):
        return extras, []

    def _co(nm):
        node = params
        for p in nm.split("."):
            node = node[int(p)] if isinstance(node, list) else node[p]
        return node["kernel"].shape[3]

    def _init_field(val, co, log: bool):
        if val is None:
            base = jnp.zeros((co,), jnp.float32)
        else:
            base = jnp.log(val.astype(jnp.float32)) if log else val.astype(jnp.float32)
        if per_step:
            base = jnp.broadcast_to(base, (S, co)) if base.ndim == 1 else base
        return base

    theta0 = {}
    if train_mult:
        theta0["logm"] = {nm: _init_field(extras[nm].out_mult, _co(nm), True) for nm in sel}
    if train_bias:
        theta0["bd"] = {nm: _init_field(extras[nm].bias_delta, _co(nm), False) for nm in sel}

    def apply_theta_on(extras_, th):
        """Build extras from theta (fields [co] in-lane / [S, co] final)."""
        out = dict(extras_)
        for nm in sel:
            ex = extras_[nm]
            m = jnp.exp(th["logm"][nm]) if "logm" in th else ex.out_mult
            bd = th["bd"][nm] if "bd" in th else ex.bias_delta
            out[nm] = _dc.replace(ex, out_mult=m, bias_delta=bd)
        return out

    def apply_theta(th):
        return apply_theta_on(extras, th)

    # qstates/extras ride through jit as ARGUMENTS (kernel-shaped
    # round_offsets as closure literals would blow the remote-compile
    # payload limit on CelebA+ models — CLAUDE.md)
    def step_loss(p, qs_, ex_, th, s, t_i, x_s, e_s):
        ex2 = apply_theta_on(ex_, th)
        t_vec = jnp.full((n,), t_i, jnp.float32)
        et = serving_surrogate_apply(qunet, p, qs_, ex2, x_s, t_vec, s,
                                     symmetric=symmetric, rank1=rank1)
        return jnp.mean(jnp.square(et - e_s)) / jnp.mean(jnp.square(e_s))

    opt = optax.adam(lr)

    if per_step:
        if chunk is None:
            chunk = next(m for m in (8, 5, 4, 2, 1) if S % m == 0)
        assert S % chunk == 0, (S, chunk)
        nch = S // chunk

        def chunk_loss(p, qs_, ex_, th_c, s_c, t_c, x_c, e_c):
            # th_c fields are [chunk, co]; vmap maps them to [co] lanes, so
            # step_loss sees 1-D extras exactly as the deployed fold will
            # (after restacking) at that step.
            per_lane = jax.vmap(step_loss, in_axes=(None, None, None, 0, 0, 0, 0, 0))(
                p, qs_, ex_, th_c, s_c, t_c, x_c, e_c
            )
            return per_lane.mean()

        @jax.jit
        def solve_all(p, qs_, ex_, theta, xs_, eref_):
            def body(_, inp):
                th_c, s_c, t_c, x_c, e_c = inp

                def it(i, carry):
                    th, st, best_l, best_th, trace = carry
                    l, g = jax.value_and_grad(chunk_loss, argnums=3)(
                        p, qs_, ex_, th, s_c, t_c, x_c, e_c)
                    better = l < best_l
                    best_l = jnp.where(better, l, best_l)
                    best_th = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(better, a, b), th, best_th
                    )
                    upd, st = opt.update(g, st)
                    th = optax.apply_updates(th, upd)
                    return th, st, best_l, best_th, trace.at[i].set(l)

                trace0 = jnp.zeros((inner + 1,), jnp.float32)
                th, st, best_l, best_th, trace = jax.lax.fori_loop(
                    0, inner, it,
                    (th_c, opt.init(th_c), jnp.float32(jnp.inf), th_c, trace0),
                )
                # final iterate: evaluate and keep if best
                l_f = chunk_loss(p, qs_, ex_, th, s_c, t_c, x_c, e_c)
                better = l_f < best_l
                best_th = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(better, a, b), th, best_th
                )
                return None, (best_th, trace.at[inner].set(l_f))

            s_grid = jnp.arange(S).reshape(nch, chunk)
            t_grid = jnp.asarray(t_rev).reshape(nch, chunk)
            x_grid = xs_.reshape(nch, chunk, *xs_.shape[1:])
            e_grid = eref_.reshape(nch, chunk, *eref_.shape[1:])
            th_grid = jax.tree_util.tree_map(
                lambda a: a.reshape(nch, chunk, *a.shape[1:]), theta
            )
            _, (th_best, traces) = jax.lax.scan(
                body, None, (th_grid, s_grid, t_grid, x_grid, e_grid)
            )
            th_final = jax.tree_util.tree_map(
                lambda a: a.reshape(S, *a.shape[2:]), th_best
            )
            return th_final, traces

        theta, traces = solve_all(params, qstates, extras, theta0, xs_in, eps_ref)
        return apply_theta(theta), np.asarray(traces)

    @jax.jit
    def run_epoch(p, qs_, ex_, theta, opt_state, xs_, eref_):
        def body(carry, inp):
            theta, opt_state = carry
            s, t_i, x_s, e_s = inp
            loss, grads = jax.value_and_grad(step_loss, argnums=3)(
                p, qs_, ex_, theta, s, t_i, x_s, e_s)
            upd, opt_state = opt.update(grads, opt_state)
            theta = optax.apply_updates(theta, upd)
            return (theta, opt_state), loss

        (theta, opt_state), losses = jax.lax.scan(
            body, (theta, opt_state),
            (jnp.arange(S), jnp.asarray(t_rev), xs_, eref_),
        )
        return theta, opt_state, losses

    @jax.jit
    def eval_epoch(p, qs_, ex_, theta, xs_, eref_):
        def body(_, inp):
            s, t_i, x_s, e_s = inp
            return None, step_loss(p, qs_, ex_, theta, s, t_i, x_s, e_s)

        _, losses = jax.lax.scan(
            body, None, (jnp.arange(S), jnp.asarray(t_rev), xs_, eref_)
        )
        return losses.mean()

    best_theta = theta0
    best_loss = float(eval_epoch(params, qstates, extras, theta0, xs_in, eps_ref))
    losses = [best_loss]
    theta, opt_state = theta0, opt.init(theta0)
    for _ep in range(epochs):
        theta, opt_state, _ = run_epoch(params, qstates, extras, theta, opt_state,
                                        xs_in, eps_ref)
        l_ep = float(eval_epoch(params, qstates, extras, theta, xs_in, eps_ref))
        losses.append(l_ep)
        if l_ep < best_loss:
            best_loss, best_theta = l_ep, theta
    return apply_theta(best_theta), losses


# ---------------------------------------------------------------------------
# Calibration-set generation (all four t-modes)
# ---------------------------------------------------------------------------


def alpha_uncertainty(qstates: Dict[str, ActQuantState], num_steps: int) -> jax.Array:
    """Per-timestep summed alpha entropy across all quantized convs
    (runners/diffusion.py:231-240)."""
    u = jnp.zeros((num_steps,))
    for st in qstates.values():
        p = jax.nn.softmax(st.alpha_logits, axis=1)  # [S, G, C]
        dim = st.alpha_logits.shape[-1]
        ent = -(p * jnp.log(p + 1e-12)).sum(axis=-1).mean(axis=1)  # [S]
        u = u + ent / dim
    return u


def select_calibration_images(
    xs_full: jax.Array,  # [S+1, N, H, W, C]: x_init then each x_t_next
    t_mode: str,
    *,
    num_steps: int,
    key: jax.Array | None = None,
    qstates: Dict[str, ActQuantState] | None = None,
    sample_count: jax.Array | None = None,
    sample_weight: float = 2.0,
    min_t: int = 30,
):
    """Pick calibration inputs from a teacher trajectory by t_mode
    (runners/diffusion.py:216-251).

    Returns (images [N,H,W,C], selected_step or None, updated sample_count).
    """
    n = xs_full.shape[1]
    if t_mode == "real":
        return xs_full[-1], None, sample_count
    if t_mode == "range":
        idx = jnp.minimum(jnp.arange(n), xs_full.shape[0] - 1)
        x = xs_full[idx, jnp.arange(n)]
        return x, None, sample_count
    if t_mode == "random":
        assert key is not None
        tval = (jax.random.normal(key, (n,)) * 0.4 + 0.4) * num_steps
        t = jnp.clip(tval.astype(jnp.int32), 0, num_steps - 1)
        x = xs_full[t, jnp.arange(n)]
        return x, None, sample_count
    if t_mode == "diff":
        assert qstates is not None
        # the reference hard-restricts to t >= 30 (runners/diffusion.py:242),
        # which assumes >30 sampler steps; clamp for shorter schedules
        min_t = max(0, min(min_t, num_steps - 1))
        if sample_count is None:
            sample_count = jnp.zeros((num_steps,))
        u = alpha_uncertainty(qstates, num_steps) - sample_weight * sample_count
        u = u[min_t:]
        # the reference takes the LAST argmax among ties
        rev_arg = jnp.argmax(u[::-1])
        t_sel = (u.shape[0] - 1 - rev_arg) + min_t
        sample_count = sample_count.at[t_sel].add(1.0)
        x = xs_full[jnp.minimum(t_sel, xs_full.shape[0] - 1)]
        return x, t_sel, sample_count
    raise NotImplementedError(t_mode)
