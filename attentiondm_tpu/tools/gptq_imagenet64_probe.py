"""Prove GPTQ engages on imagenet64's K=18432 layers (VERDICT r4 item #2).

Round 4 capped the Gram at K=12288, so imagenet64's widest up-block conv1
(K = 9*2048 from the 1024+1024 skip concat) silently fell back to
round-to-nearest.  Round 5 raised GRAM_K_MAX to 18432 and made GPTQ's
compensation lazily blocked (quant/gptq.py).  This probe runs the REAL
pipeline on the real chip at the imagenet64 shape and reports:

  1. that no RTN-fallback advisory fires on any layer (cap respected);
  2. that the K=18432 layers receive integer rounding offsets, with the
     offset spread (GPTQ moves weights multiple levels, unlike AdaRound);
  3. a quality row: Gram-weighted output-space quadratic error of the
     largest layer's W4 fold, RTN vs GPTQ — the per-layer objective GPTQ
     minimizes, measured on held-out calibration statistics;
  4. end-to-end eps deviation of a 2-step W4A8 serving forward (RTN fold vs
     GPTQ fold) against the FP32 teacher — the serving-path quality row.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site \
      python -m attentiondm_tpu.tools.gptq_imagenet64_probe [--steps 2]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--json_out", default="")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    print(jax.devices())

    from ..config import load_config
    from ..diffusion import DiffusionSchedule, ddim_sample, make_timestep_seq
    from ..models import UNetConfig, unet_apply, unet_init
    from ..quant import QuantizedUNet, calibrate_ranges
    from ..quant.adaround import GRAM_K_MAX, collect_conv_stats, compute_weight_extras

    cfg = UNetConfig.from_config(load_config("imagenet64.yml"))
    params = unet_init(jax.random.PRNGKey(0), cfg)
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"imagenet64 UNet: {n_par/1e6:.1f}M params")

    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = make_timestep_seq(1000, args.steps, "quad")
    x0 = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 64, 64, 3))
    t0 = time.time()
    _, traj, _ = jax.jit(
        lambda p, x: ddim_sample(lambda xt, t, i: unet_apply(p, cfg, xt, t), x,
                                 seq, sched.betas, keep_trajectory=True)
    )(params, x0)
    xs = jnp.concatenate([x0[None], traj[:-1]], axis=0)
    print(f"teacher trajectory: {time.time()-t0:.1f}s")

    qunet = QuantizedUNet.create(cfg, bitwidth=4, a_bitwidth=8)
    qstates = calibrate_ranges(qunet, params, qunet.init_state(args.steps),
                               xs, seq, first=True)
    print("stage-1 ranges calibrated")

    # capture advisories: the r4 gap was a silent RTN fallback warning
    advisories = []

    class _H(logging.Handler):
        def emit(self, rec):
            if "exceeds k_max" in rec.getMessage():
                advisories.append(rec.getMessage())

    logging.getLogger().addHandler(_H())
    t0 = time.time()
    extras = compute_weight_extras(
        qunet, params, qstates, xs, seq, max_steps=args.steps, method="gptq",
    )
    print(f"GPTQ weight pass: {time.time()-t0:.1f}s, {len(extras)} layers")

    from ..models.unet import iter_conv_layers

    k_of = {n: k * k * c for n, c, k in iter_conv_layers(cfg)}
    big = [n for n in extras if k_of.get(n, 0) == 18432]
    report = {
        "advisories": advisories,
        "gram_k_max": GRAM_K_MAX,
        "n_layers_with_offsets": sum(
            1 for e in extras.values() if e.round_offset is not None),
        "k18432_layers": len(big),
        "k18432_with_offsets": sum(
            1 for n in big if extras[n].round_offset is not None),
    }
    assert not advisories, f"RTN fallback fired: {advisories}"
    assert report["k18432_with_offsets"] == len(big) > 0, report

    # offset spread on the largest layer: GPTQ compensation moves weights
    # multiple grid levels (AdaRound is {0,1})
    name = big[0]
    off = np.asarray(extras[name].round_offset)
    report["largest_layer"] = name
    report["offset_min_max"] = [int(off.min()), int(off.max())]
    report["offset_nonzero_frac"] = float((off != 0).mean())

    # quality row (layer objective): Gram-weighted quadratic error RTN vs GPTQ
    from ..ops.quant_conv import weight_grid
    from ..quant.state import mixed_ranges

    stats = collect_conv_stats(params, cfg, xs, seq, max_steps=args.steps,
                               names=[name], k_cap=18432)[name]
    node = params
    for p_ in name.split("."):
        node = node[int(p_)] if isinstance(node, list) else node[p_]
    kernel = node["kernel"]
    kh, kw, ci, co = kernel.shape
    st = qstates[name]
    n_lv = 2 ** 8 - 1

    def at(s):
        rmin, rmax = mixed_ranges(st, s)
        return n_lv / (rmax - rmin)

    scale = jax.vmap(at)(jnp.arange(args.steps)).mean(axis=0)
    g = (kernel / scale.reshape(1, 1, ci, 1)).reshape(kh * kw * ci, co)
    shrink = extras[name].shrink
    ws, wzp = weight_grid(g, 4, True, jnp.broadcast_to(shrink, (co,)))
    H = stats.gram / jnp.maximum(stats.count, 1.0)
    base = ws[None] * g - wzp[None]
    rtn_q = jnp.clip(jnp.round(base), -8, 7)
    gptq_q = jnp.clip(jnp.floor(base) + extras[name].round_offset.reshape(-1, co),
                      -8, 7)

    @jax.jit
    def quad(q):
        d = (q + wzp[None]) / ws[None] - g
        return jnp.sum(d * (H @ d))

    e_rtn, e_gptq = float(quad(rtn_q)), float(quad(gptq_q))
    report["quad_err_rtn"] = e_rtn
    report["quad_err_gptq"] = e_gptq
    report["gptq_vs_rtn"] = e_gptq / max(e_rtn, 1e-30)
    print(f"{name}: quad err GPTQ/RTN = {report['gptq_vs_rtn']:.3f}")

    # end-to-end serving quality row: eps vs FP32 teacher, RTN vs GPTQ fold
    from ..quant.int8_serving import prepare_serving_runtime, serving_model_fn

    t = jnp.full((args.batch,), float(int(seq[-1])))
    eps_fp = jax.jit(lambda p, x: unet_apply(p, cfg, x, t))(params, xs[-1])
    for label, ex in (("rtn", None), ("gptq", extras)):
        rt = prepare_serving_runtime(qunet, params, qstates, weight_extras=ex)
        eps = serving_model_fn(qunet, rt, params, qstates, attn_int8=False)(
            xs[-1], t, jnp.asarray(args.steps - 1))
        rel = float(jnp.mean((eps - eps_fp) ** 2) / jnp.mean(eps_fp ** 2))
        report[f"eps_rel_mse_{label}"] = rel
        print(f"serving W4A8 eps rel-MSE vs fp32 ({label} fold): {rel:.4f}")
        del rt

    print("JSON:", json.dumps(report))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
