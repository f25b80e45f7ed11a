"""End-to-end quantization quality protocol (VERDICT r1 missing-item 1).

The north star of the reference is that attention-aware calibrated W4A8
sampling stays close to FP32 (BASELINE.md: "FID within 0.5").  Zero egress
blocks the published checkpoints and the canonical pt_inception weights, so
FID itself cannot be reproduced here; this protocol measures what CAN be
measured, on trained weights (tools/train_synthetic.py), end to end on the
real device:

- **teacher-forced per-step eps-MSE**: run the quantized model on the FP32
  sampler's own trajectory inputs x_t and compare its eps prediction to the
  FP32 one, step by step.  Relative MSE (normalized by mean eps^2) isolates
  the quantization error from the schedule's changing eps magnitude.
- **free-running final-image PSNR**: run each quantized sampler from the same
  x_T and PSNR the final images against the FP32 run (data range 2.0, images
  clipped to [-1, 1]).

Evaluated configurations: W8A8 / W6A6 / W4A8 fake-quant at stage 1
(ranges/LAPQ) and stage 1+2 (attention-focused differentiable group
selection), the true-int8 serving path (f32 and bf16 residual streams), and
the bf16 compute path — the last two validate the shipping performance modes
(VERDICT r1 weak-items 9 and 1).

Everything jitted takes params as ARGUMENTS (remote-compile payload limit).
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json

import jax
import os as _os
jax.config.update("jax_compilation_cache_dir", _os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from ..diffusion import DiffusionSchedule, ddim_sample, make_timestep_seq
from ..diffusion.sampling import _seq_alphas
from ..models import UNetConfig, unet_apply, unet_init
from ..models.unet import cast_params
from ..quant import QuantizedUNet, calibrate_ranges
from ..quant.calibrate import calibrate_differentiable


def kid_proxy(feats_a, feats_b) -> float:
    """Unbiased KID (MMD^2, polynomial kernel (x.y/d + 1)^3) between two
    feature sets — the small-N-stable distributional metric (Binkowski et
    al. 2018).  Features come from the vendored InceptionV3-FID architecture
    with SEEDED RANDOM weights (eval/inception.py::InceptionV3FID.random):
    zero egress blocks the canonical pt_inception weights, and random-CNN
    features are a standard stand-in for distributional comparison.  Only
    comparisons within one protocol run (same seed) are meaningful.
    """
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    # Standardize per-dimension against the REFERENCE set's stats: a random
    # (untrained) CNN shrinks feature scale by orders of magnitude per layer
    # (measured ~1e-19 at the 2048-d pool), which drives the polynomial
    # kernel to the constant 1 and makes raw MMD^2 read 0 for any pair of
    # sets.  Only relative variation carries signal, so rescale it to O(1).
    mu = b.mean(axis=0)
    sd = b.std(axis=0)
    sd = np.maximum(sd, 1e-6 * (sd.mean() + 1e-300))
    # clip z-scores: near-constant reference dims otherwise explode through
    # the cubic kernel (measured 1e37 on disjoint sets without the clip)
    a = np.clip((a - mu) / sd, -5.0, 5.0)
    b = np.clip((b - mu) / sd, -5.0, 5.0)
    d = a.shape[1]
    m, n = a.shape[0], b.shape[0]

    def k(x, y):
        return (x @ y.T / d + 1.0) ** 3

    kaa = k(a, a)
    kbb = k(b, b)
    kab = k(a, b)
    t_aa = (kaa.sum() - np.trace(kaa)) / (m * (m - 1))
    t_bb = (kbb.sum() - np.trace(kbb)) / (n * (n - 1))
    t_ab = kab.mean()
    return float(t_aa + t_bb - 2 * t_ab)


def calibrate_naive_tensorwise(qunet, params, qstates, xs_in, seq):
    """Stage-0 baseline: plain per-step per-TENSOR min/max ranges.

    No LAPQ shrink, no group-wise bucketing, no per-channel structure —
    the naive PTQ every paper compares against.  Isolates what stage 1's
    machinery (groupwise_ranges + the 9-candidate grid) actually buys.
    """
    from ..models.unet import unet_apply as _ua
    from ..quant.qunet import make_quant_conv_apply

    t_rev = np.asarray(list(seq))[::-1]
    S = xs_in.shape[0]
    new_states = {n: st for n, st in qstates.items()}

    @jax.jit
    def collect_step(p, x, t):
        collect = {}
        ca = make_quant_conv_apply({}, qunet.policy, 0, mode="collect", collect=collect)
        _ = _ua(p, qunet.cfg, x, t, conv_apply=ca)
        return collect

    per_step = []
    for i in range(S):
        t_vec = jnp.full((xs_in.shape[1],), float(t_rev[i]), jnp.float32)
        per_step.append(collect_step(params, xs_in[i], t_vec))
    for name, st in qstates.items():
        gr = st.group_ranges
        for i in range(S):
            cmin, cmax = per_step[i][name]
            tmin, tmax = jnp.min(cmin), jnp.max(cmax)
            gr = gr.at[i, :, 0].set(tmin).at[i, :, 1].set(tmax)
        new_states[name] = dataclasses.replace(st, group_ranges=gr)
    return new_states


def _dump_live(tag: str) -> None:
    """Print live-device-array census (count, GB, top shapes) — the OOM
    debugging tool that found the ladder's hidden multi-GB retainers."""
    try:
        arrs = jax.live_arrays()
    except Exception:
        return
    tot = sum(a.nbytes for a in arrs)
    from collections import Counter

    top = Counter()
    for a in arrs:
        top[(str(a.dtype), a.shape)] += a.nbytes
    print(f"LIVE[{tag}] {len(arrs)} arrays, {tot/2**30:.2f} GiB", flush=True)
    for (dt, sh), b in top.most_common(8):
        print(f"  {b/2**30:6.2f} GiB  {dt} {sh}", flush=True)


def psnr(a, b, data_range: float = 2.0) -> float:
    """PSNR between two image batches clipped to the data domain."""
    a = jnp.clip(a, -1.0, 1.0)
    b = jnp.clip(b, -1.0, 1.0)
    mse = float(jnp.mean(jnp.square(a - b)))
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


# ---------------------------------------------------------------------------
# teacher-forced eps comparison
# ---------------------------------------------------------------------------


def _eps_scan(model_fn, xs_in, t_rev):
    """[S] model eps predictions along a fixed trajectory (single scan)."""

    def body(_, inp):
        x, t_i, i = inp
        t = jnp.full((x.shape[0],), t_i, jnp.float32)
        return None, model_fn(x, t, i)

    idxs = jnp.arange(xs_in.shape[0], dtype=jnp.int32)
    _, eps = jax.lax.scan(body, None, (xs_in, t_rev.astype(jnp.float32), idxs))
    return eps  # [S, N, H, W, C]


def rel_eps_mse(eps_q, eps_ref):
    """Per-step relative eps-MSE: mean((q-ref)^2) / mean(ref^2).  [S]."""
    num = jnp.mean(jnp.square(eps_q - eps_ref), axis=(1, 2, 3, 4))
    den = jnp.mean(jnp.square(eps_ref), axis=(1, 2, 3, 4))
    return num / den


# ---------------------------------------------------------------------------
# protocol
# ---------------------------------------------------------------------------


def run_protocol(
    params,
    cfg: UNetConfig,
    *,
    steps: int = 100,
    skip_type: str = "quad",
    batch: int = 64,
    calib_batch: int = 8,
    key=None,
    bit_configs=((8, 8), (6, 6), (4, 8)),
    stage2: bool = True,
    serving: bool = True,
    bf16: bool = True,
    stage0: bool = False,
    attribution: bool = False,
    kid: bool = False,
    stage2_lr: float = 0.05,
    stage2_epochs: int = 1,
    adaround: bool = False,
    adaround_iters: int = 600,
    stage2_teacher: bool = False,
    shared: bool = False,
    weight_rows: str = "all",
):
    """Returns {row_name: {"eps_rel_mse_mean", "eps_rel_mse_max", "psnr"[, "kid"]}}.

    Row names: fp32 (reference row, PSNR=inf), bf16, w{W}a{A}_s0 (naive
    per-tensor ranges, `stage0`), w{W}a{A}_s1, w{W}a{A}_s12,
    int8_w{W}a{A} (+ _bf16res), and with `attribution` the isolation rows
    w4only (4-bit weights, FP activations) / w16a8_s1 (near-lossless
    weights, 8-bit activations).  `kid` adds the random-feature KID proxy
    of each config's free-run samples against the FP32 samples.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = make_timestep_seq(1000, steps, skip_type)
    t_rev, _, _, _ = _seq_alphas(sched.betas, seq)
    k_eval, k_cal = jax.random.split(key)

    # --- FP32 teacher: free run + trajectory inputs + reference eps
    def fp_fn_of(p):
        return lambda xt, t, i: unet_apply(p, cfg, xt, t)

    @jax.jit
    def teacher(p, x):
        xf, traj, _ = ddim_sample(fp_fn_of(p), x, seq, sched.betas, keep_trajectory=True)
        xs_in = jnp.concatenate([x[None], traj[:-1]], axis=0)
        eps_ref = _eps_scan(fp_fn_of(p), xs_in, t_rev)
        return xf, xs_in, eps_ref

    x_init = jax.random.normal(k_eval, (batch, cfg.resolution, cfg.resolution, cfg.in_channels))
    x_fp, xs_in, eps_ref = teacher(params, x_init)

    # --- calibration trajectory (separate small batch, like production)
    x_cal = jax.random.normal(k_cal, (calib_batch,) + x_init.shape[1:])

    @jax.jit
    def calib_traj(p, x):
        xf, traj, _ = ddim_sample(fp_fn_of(p), x, seq, sched.betas, keep_trajectory=True)
        return xf, jnp.concatenate([x[None], traj[:-1]], axis=0)

    imgs_cal, xs_cal = calib_traj(params, x_cal)

    rows = {"fp32": dict(eps_rel_mse_mean=0.0, eps_rel_mse_max=0.0, psnr=float("inf"))}

    extract = None
    feats_fp = None
    if kid:
        from ..eval.inception import InceptionV3FID

        inc = InceptionV3FID.random(seed=0)

        def extract(imgs):
            x01 = jnp.clip((imgs + 1.0) * 0.5, 0.0, 1.0)
            return np.asarray(inc.extract(x01))

        feats_fp = extract(x_fp)
        rows["fp32"]["kid"] = 0.0

    def add_row(name, eps_q, x_final):
        r = rel_eps_mse(eps_q, eps_ref)
        rows[name] = dict(
            eps_rel_mse_mean=float(r.mean()),
            eps_rel_mse_max=float(r.max()),
            psnr=psnr(x_final, x_fp),
        )
        if extract is not None:
            rows[name]["kid"] = kid_proxy(extract(x_final), feats_fp)
        # incremental: a 60-90 min ladder must not lose every computed row
        # to a late OOM/wedge (it did, twice, on the celeba-shape run)
        print("ROW", name, json.dumps(rows[name]), flush=True)

    # --- bf16 compute path
    if bf16:
        p_b = cast_params(params, jnp.bfloat16)

        def bf_fn_of(p):
            return lambda xt, t, i: unet_apply(p, cfg, xt, t, compute_dtype=jnp.bfloat16)

        @jax.jit
        def run_bf16(p, x, xs):
            xf = ddim_sample(bf_fn_of(p), x, seq, sched.betas)
            return xf, _eps_scan(bf_fn_of(p), xs, t_rev)

        xf_b, eps_b = run_bf16(p_b, x_init, xs_in)
        add_row("bf16", eps_b, xf_b)

    # --- attribution rows: isolate weight-vs-activation quantization
    if attribution:
        q4 = QuantizedUNet.create(cfg, bitwidth=4, a_bitwidth=8)
        qp4, _ = q4.prepare_params(params)

        @jax.jit
        def run_wonly(qp, x, xs):
            fn = lambda xt, t, i: unet_apply(qp, cfg, xt, t)
            return ddim_sample(fn, x, seq, sched.betas), _eps_scan(fn, xs, t_rev)

        xf_w, eps_w = run_wonly(qp4, x_init, xs_in)
        add_row("w4only", eps_w, xf_w)

    if attribution and (16, 8) not in tuple(bit_configs):
        bit_configs = tuple(bit_configs) + ((16, 8),)

    # --- fake-quant configs
    for w_bit, a_bit in bit_configs:
        qunet = QuantizedUNet.create(cfg, bitwidth=w_bit, a_bitwidth=a_bit)
        qstates = qunet.init_state(steps)
        qstates = calibrate_ranges(qunet, params, qstates, xs_cal, seq, first=True)
        qparams, _ = qunet.prepare_params(params)

        def q_fn_of(qp, qs):
            return lambda xt, t, i: qunet.apply(qp, qs, xt, t, i, mode="infer")

        @jax.jit
        def run_q(qp, qs, x, xs):
            xf = ddim_sample(q_fn_of(qp, qs), x, seq, sched.betas)
            return xf, _eps_scan(q_fn_of(qp, qs), xs, t_rev)

        if stage0:
            qs0 = calibrate_naive_tensorwise(
                qunet, params, qunet.init_state(steps), xs_cal, seq
            )
            xf_0, eps_0 = run_q(qparams, qs0, x_init, xs_in)
            add_row(f"w{w_bit}a{a_bit}_s0", eps_0, xf_0)

            # stage 1 WITHOUT the reference's [-4, 6] range floor
            # (quant_util.py:91-92, 193-196): pure data-driven per-channel
            # group ranges.  Tests whether the floor — far wider than the
            # post-swish activations it guards — is what keeps stage 1 from
            # beating naive per-tensor ranges.
            q_nf = QuantizedUNet(
                cfg=qunet.cfg,
                policy={
                    n: dataclasses.replace(p, init_min=0.0, init_max=1e-6)
                    for n, p in qunet.policy.items()
                },
            )
            qs_nf = calibrate_ranges(
                q_nf, params, q_nf.init_state(steps), xs_cal, seq, first=True
            )
            xf_nf, eps_nf = run_q(qparams, qs_nf, x_init, xs_in)
            add_row(f"w{w_bit}a{a_bit}_s1nf", eps_nf, xf_nf)

        xf_q, eps_q = run_q(qparams, qstates, x_init, xs_in)
        add_row(f"w{w_bit}a{a_bit}_s1", eps_q, xf_q)

        qstates_tm = None
        eps_cal_ref = None  # FP teacher eps over xs_cal, computed at most once
        if stage2_teacher:
            # teacher-matched stage 2 (round 3): optimize alpha + range
            # scale against the FP32 teacher's eps on its own trajectory
            from ..quant.calibrate import calibrate_teacher_matched

            @jax.jit
            def calib_eps_ref(p, xs):
                return _eps_scan(fp_fn_of(p), xs, t_rev)

            eps_cal_ref = calib_eps_ref(params, xs_cal)
            qstates_tm, _tml = calibrate_teacher_matched(
                qunet, qparams, qstates, xs_cal, eps_cal_ref, seq,
                lr=0.02, epochs=8,
            )
            xf_t, eps_t = run_q(qparams, qstates_tm, x_init, xs_in)
            add_row(f"w{w_bit}a{a_bit}_s12t", eps_t, xf_t)

        if stage2:
            qstates2, _losses = calibrate_differentiable(
                qunet, params, qstates, imgs_cal, seq, sched.betas,
                key=jax.random.fold_in(key, 7), lr=stage2_lr, attention_focus=True,
            )

            # production inference path ("infer" mixes group ranges with the
            # learned softmax(alpha) — stage-2's output flows through it)
            xf_q2, eps_q2 = run_q(qparams, qstates2, x_init, xs_in)
            add_row(f"w{w_bit}a{a_bit}_s12", eps_q2, xf_q2)

            # general (all-conv) differentiable pass, for scale comparison
            qstates2g, _ = calibrate_differentiable(
                qunet, params, qstates, imgs_cal, seq, sched.betas,
                key=jax.random.fold_in(key, 8), lr=stage2_lr, attention_focus=False,
            )
            xf_g, eps_g = run_q(qparams, qstates2g, x_init, xs_in)
            add_row(f"w{w_bit}a{a_bit}_s12g", eps_g, xf_g)

            if stage2_epochs > 1:
                # multi-epoch stage 2: each alpha[s] slice gets `epochs`
                # AdamW updates instead of the reference's single one
                qstates2e, _ = calibrate_differentiable(
                    qunet, params, qstates, imgs_cal, seq, sched.betas,
                    key=jax.random.fold_in(key, 9), lr=stage2_lr,
                    attention_focus=False, epochs=stage2_epochs,
                )
                xf_e, eps_e = run_q(qparams, qstates2e, x_init, xs_in)
                add_row(f"w{w_bit}a{a_bit}_s12e{stage2_epochs}", eps_e, xf_e)

        if serving and (w_bit, a_bit) == (4, 8):
            from ..quant.int8_serving import (
                prepare_serving_runtime,
                serving_ddim_sampler,
                serving_unet_apply,
            )

            def serving_row(suffix, qs, extras, res_dtype, rank1=False):
                # ONE fold per row, shared by the sampler and the eps scan —
                # two private folds (S x params each) doubled the row's HBM
                # peak and OOM'd the celeba-shape ladder mid-run
                runtime = prepare_serving_runtime(
                    qunet, params, qs, weight_extras=extras, rank1=rank1
                )
                sample = serving_ddim_sampler(
                    qunet, params, qs, seq, sched.betas,
                    residual_dtype=res_dtype, attn_int8=False,
                    weight_extras=extras, rank1=rank1, runtime=runtime,
                )
                xf_s = sample(x_init)

                @functools.partial(jax.jit, static_argnums=())
                def eps_serving(p, rt, qs_, xs):
                    def body(_, inp):
                        x, t_i, i = inp
                        t = jnp.full((x.shape[0],), t_i, jnp.float32)
                        e = serving_unet_apply(
                            p, cfg, qunet, rt, qs_, x, t, i,
                            residual_dtype=res_dtype, attn_int8=False,
                        )
                        return None, e

                    idxs = jnp.arange(xs.shape[0], dtype=jnp.int32)
                    _, eps = jax.lax.scan(
                        body, None, (xs, t_rev.astype(jnp.float32), idxs)
                    )
                    return eps

                eps_s = eps_serving(params, runtime, qs, xs_in)
                add_row(f"int8_w{w_bit}a{a_bit}{suffix}", eps_s, xf_s)
                del sample, eps_serving, runtime, xf_s, eps_s
                # the jit wrappers sit in reference cycles, so the row's
                # S x params fold only dies on a gen-2 GC pass — which device
                # allocations never trigger.  Collect NOW or the next row's
                # fold (and the GPTQ Gram stage) stacks on top of this one.
                import gc

                gc.collect()

            serving_row("", qstates, None, jnp.float32)
            serving_row("_bf16res", qstates, None, jnp.bfloat16)

            if adaround:
                # the round-3 weight-quality ladder: bias correction alone,
                # AdaRound + bias correction, and the full combo on the
                # teacher-matched stage-2 states.  `weight_rows` splits the
                # ladder into independently-runnable legs ("ar" / "gptq" /
                # "all") so a big-model run fits the chip's free HBM — the
                # AR leg's round_offset buffers never coexist with the GPTQ
                # Gram collection in split mode.
                from ..quant.adaround import WeightExtras, compute_weight_extras
                from ..quant.calibrate import refine_weight_extras

                # Gram/AdaRound collection materializes [B*H*W, K] im2col
                # patches per layer inside one program — cap the collection
                # batch so the patch volume stays at the CIFAR-tuned level
                # (the full calib_batch at 64^2 OOM'd the celeba ladder)
                gram_b = max(1, min(calib_batch,
                                    (calib_batch * 1024) // cfg.resolution**2))
                xs_gram = xs_cal[:, :gram_b]

                if eps_cal_ref is None:

                    @jax.jit
                    def _cal_eps(p, xs):
                        return _eps_scan(fp_fn_of(p), xs, t_rev)

                    eps_cal_ref = _cal_eps(params, xs_cal)
                eps_cal = eps_cal_ref

                if weight_rows in ("all", "ar"):
                    extras = compute_weight_extras(
                        qunet, params, qstates, xs_gram, seq, iters=adaround_iters
                    )
                    extras_bc = {
                        n: WeightExtras(round_offset=None, mu=e.mu)
                        for n, e in extras.items()
                    }
                    serving_row("_bc", qstates, extras_bc, jnp.float32)
                    serving_row("_ar", qstates, extras, jnp.float32)
                    serving_row("_ar_bf16res", qstates, extras, jnp.bfloat16)

                    # trajectory-distilled per-step fold refinement — the W4
                    # closer: per-step out_mult/bias_delta remove the
                    # systematic per-step weight error that compounds over
                    # the free run
                    extras_ps, _ = refine_weight_extras(
                        qunet, params, qstates, extras, xs_cal, eps_cal, seq,
                        per_step=True,
                    )
                    serving_row("_ar_refine", qstates, extras_ps, jnp.float32)
                    serving_row("_ar_refine_bf16res", qstates, extras_ps,
                                jnp.bfloat16)
                    # free device buffers before GPTQ (extras stays alive
                    # only if the _ar_s2srv row still needs it)
                    del extras_ps, extras_bc
                    if not stage2_teacher:
                        del extras

                if weight_rows not in ("all", "gptq"):
                    continue
                _dump_live("before gptq extras")
                # GPTQ rounding ladder (error-compensated rounding), alone
                # and with the same per-step refinement on top
                extras_g = compute_weight_extras(
                    qunet, params, qstates, xs_gram, seq, method="gptq"
                )
                serving_row("_gptq", qstates, extras_g, jnp.float32)
                extras_gps, _ = refine_weight_extras(
                    qunet, params, qstates, extras_g, xs_cal, eps_cal, seq,
                    per_step=True,
                )
                serving_row("_gptq_refine", qstates, extras_gps, jnp.float32)
                if shared:
                    # step-SHARED rank-1 fold (quant/rank1.py): the production
                    # ladder with gq stored once — quality cost of the rank-1
                    # activation-scale constraint, before and after the
                    # per-step refinement that absorbs its systematic residue
                    extras_sh = compute_weight_extras(
                        qunet, params, qstates, xs_gram, seq, method="gptq",
                        rank1=True,
                    )
                    serving_row("_gptq_shared", qstates, extras_sh,
                                jnp.float32, rank1=True)
                    extras_shps, _ = refine_weight_extras(
                        qunet, params, qstates, extras_sh, xs_cal, eps_cal,
                        seq, per_step=True, rank1=True,
                    )
                    serving_row("_gptq_refine_shared", qstates, extras_shps,
                                jnp.float32, rank1=True)
                if stage2_teacher:
                    # serving-matched stage 2 ON TOP of AdaRound: ranges
                    # optimized through the exact fold (pinned shrink + h).
                    # (The fake-quant-grid combo was measured WORSE than
                    # AdaRound alone — quality_r3 _ar_s12t 17.2 vs _ar 19.6.)
                    from ..quant.calibrate import calibrate_teacher_matched as _ctm

                    qstates_srv, _ = _ctm(
                        qunet, params, qstates, xs_cal, eps_cal_ref, seq,
                        lr=0.02, epochs=8, serving_extras=extras,
                    )
                    serving_row("_ar_s2srv", qstates_srv, extras, jnp.float32)

    return rows


def format_table(rows) -> str:
    has_kid = any("kid" in r for r in rows.values())
    hdr = "| config | eps rel-MSE (mean) | eps rel-MSE (max) | final PSNR vs FP32 (dB) |"
    sep = "|---|---|---|---|"
    if has_kid:
        hdr += " KID-proxy (x1e3) |"
        sep += "---|"
    lines = [hdr, sep]
    for name, r in rows.items():
        p = "inf" if np.isinf(r["psnr"]) else f"{r['psnr']:.1f}"
        line = f"| {name} | {r['eps_rel_mse_mean']:.6g} | {r['eps_rel_mse_max']:.6g} | {p} |"
        if has_kid:
            line += f" {1e3 * r['kid']:.3f} |" if "kid" in r else " - |"
        lines.append(line)
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None,
                    help="EMA npz from tools/train_synthetic.py (random init if absent)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--calib_batch", type=int, default=8)
    ap.add_argument("--skip_type", type=str, default="quad")
    ap.add_argument("--json_out", type=str, default=None)
    ap.add_argument("--no_stage2", action="store_true")
    ap.add_argument("--no_serving", action="store_true")
    ap.add_argument("--stage0", action="store_true",
                    help="add naive per-tensor-range baseline rows")
    ap.add_argument("--attribution", action="store_true",
                    help="add weight-only / act-only isolation rows")
    ap.add_argument("--kid", action="store_true",
                    help="add random-feature KID proxy vs the FP32 samples")
    ap.add_argument("--stage2_epochs", type=int, default=1,
                    help=">1 adds a multi-epoch stage-2 row")
    ap.add_argument("--adaround", action="store_true",
                    help="add bias-correction / AdaRound serving rows")
    ap.add_argument("--adaround_iters", type=int, default=600)
    ap.add_argument("--stage2_teacher", action="store_true",
                    help="add teacher-matched stage-2 rows (_s12t)")
    ap.add_argument("--shared", action="store_true",
                    help="add step-SHARED rank-1 fold rows (_gptq_shared / "
                         "_gptq_refine_shared); requires --adaround")
    ap.add_argument("--bits", type=str, default=None,
                    help="restrict bit configs, e.g. '8:8,4:8' (default: 8:8, 6:6, 4:8)")
    ap.add_argument("--config", type=str, default=None,
                    help="config YAML overriding the CIFAR-10 UNetConfig "
                         "(e.g. celeba.yml — second-family quality ladder)")
    ap.add_argument("--weight_rows", default="all",
                    choices=("all", "ar", "gptq"),
                    help="split the --adaround weight ladder into "
                         "independently-runnable legs (big-model HBM)")
    args = ap.parse_args()

    cfg = UNetConfig()
    if args.config:
        from ..config import load_config

        cfg = UNetConfig.from_config(load_config(args.config))
    params = unet_init(jax.random.PRNGKey(0), cfg)
    weights = "random-init"
    if args.ckpt:
        from ..checkpoint import load_checkpoint

        params = load_checkpoint(args.ckpt, params)  # raw EMA tree
        weights = f"trained ({args.ckpt})"

    kw = {}
    if args.bits:
        kw["bit_configs"] = tuple(
            tuple(int(b) for b in part.split(":")) for part in args.bits.split(",")
        )
    rows = run_protocol(
        params, cfg, steps=args.steps, skip_type=args.skip_type,
        batch=args.batch, calib_batch=args.calib_batch,
        stage2=not args.no_stage2, serving=not args.no_serving,
        stage0=args.stage0, attribution=args.attribution, kid=args.kid,
        stage2_epochs=args.stage2_epochs,
        adaround=args.adaround, adaround_iters=args.adaround_iters,
        stage2_teacher=args.stage2_teacher, shared=args.shared,
        weight_rows=args.weight_rows, **kw,
    )
    print(f"weights: {weights}; DDIM-{args.steps} ({args.skip_type}), batch {args.batch}")
    print(format_table(rows))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"weights": weights, "rows": rows}, f, indent=2)


if __name__ == "__main__":
    main()
