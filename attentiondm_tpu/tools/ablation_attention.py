"""Attention-precision ablation: four quantization variants, calibrated,
sampled, and scored.

Rebuild of `ablation_study_attention_quantization.py` (the reference's
587-line harness): variants A (uniform low-bit), B (conv low / attention
high), C (conv high / attention low), D (uniform high-bit) — reference
:111-155; calibration by probe-timestep forwards (:231-272); DDPM ancestral
sampling (the reference's sampler had the alpha_bar bug D9 — ours uses the
correct cumulative schedule via diffusion.sampling); FID between each
variant's samples and a reference image set; CLIP scoring is gated (no model
weights on a zero-egress box).

Writes `ablation_results.yaml` like the reference (:539-540).
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..models.unet import UNetConfig, iter_conv_layers
from ..models import unet_init, unet_apply
from ..quant import QuantizedUNet, calibrate_ranges
from ..quant.qunet import make_bit_policy
from ..quant.state import ActQuantConfig
from ..diffusion import DiffusionSchedule, ddim_sample, ddpm_sample, make_timestep_seq
from ..data import inverse_data_transform
from ..utils import save_image
from ..eval.fid import calculate_activation_statistics, calculate_frechet_distance

VARIANTS = {
    # name: (conv_bits, attention_bits)  — reference :111-155
    "A_uniform_low": (4, 4),
    "B_conv_low_attn_high": (4, 8),
    "C_conv_high_attn_low": (8, 4),
    "D_uniform_high": (8, 8),
}


def make_variant_policy(cfg: UNetConfig, conv_bits: int, attn_bits: int):
    """Per-variant policy: attention projections at attn_bits (key still gets
    the max(4, b-2) downgrade), everything else at conv_bits."""
    policy = dict(make_bit_policy(cfg, conv_bits))
    for name, _cin, _k in iter_conv_layers(cfg):
        leaf = name.rsplit(".", 1)[-1]
        if ".attn" in name or name.startswith("mid.attn"):
            if leaf in ("k", "key_conv"):
                b = max(4, attn_bits - 2)
                policy[name] = ActQuantConfig(w_bit=b, a_bit=b, group_num=8)
            elif leaf in ("v", "value_conv"):
                policy[name] = ActQuantConfig(w_bit=attn_bits, a_bit=attn_bits, group_num=4)
            else:
                policy[name] = ActQuantConfig(w_bit=attn_bits, a_bit=attn_bits, group_num=8)
    return policy


@dataclasses.dataclass
class AblationConfig:
    sampler: str = "ddpm"  # reference uses ancestral sampling (:274-372)
    steps: int = 50
    num_samples: int = 64
    batch: int = 32
    calib_batch: int = 2
    seed: int = 0


def run_attention_ablation(
    config,
    out_dir: str,
    *,
    params=None,
    extractor=None,
    ablation_cfg: AblationConfig | None = None,
    clip_scorer=None,
):
    """Run the 4-variant study.  `extractor(x01_nhwc) -> [N, D]` supplies FID
    features (pass InceptionV3FID.extract for canonical FID); `clip_scorer`
    is optional (None -> skipped, matching this image's no-weights reality)."""
    acfg = ablation_cfg or AblationConfig()
    cfg = UNetConfig.from_config(config)
    sched = DiffusionSchedule.from_config(config)
    if params is None:
        params = unet_init(jax.random.PRNGKey(acfg.seed), cfg)
    seq = make_timestep_seq(sched.num_timesteps, acfg.steps, "uniform")
    S = len(seq)
    os.makedirs(out_dir, exist_ok=True)

    # FP reference samples (the comparison target for FID)
    fp_fn = lambda xt, t, i: unet_apply(params, cfg, xt, t)

    def sample_with(model_fn, key):
        imgs = []
        done = 0
        if acfg.sampler == "ddpm":
            jitted = jax.jit(lambda x, k: ddpm_sample(model_fn, x, seq, sched.betas, key=k))
        else:
            jitted = jax.jit(lambda x, k: ddim_sample(model_fn, x, seq, sched.betas, key=k))
        while done < acfg.num_samples:
            n = min(acfg.batch, acfg.num_samples - done)
            key, k1, k2 = jax.random.split(key, 3)
            x = jax.random.normal(k1, (n, cfg.resolution, cfg.resolution, cfg.in_channels))
            out = jitted(x, k2)
            imgs.append(inverse_data_transform(config, jax.device_get(out)))
            done += n
        return np.concatenate(imgs)

    key = jax.random.PRNGKey(acfg.seed + 1)
    t0 = time.time()
    fp_imgs = sample_with(fp_fn, key)
    logging.info(f"FP reference samples: {fp_imgs.shape[0]} in {time.time()-t0:.1f}s")

    if extractor is None:
        # mean-pool fallback: relative comparisons only
        def extractor(x):
            return x.reshape(x.shape[0], -1, cfg.in_channels).mean(axis=1)

    mu_fp, sig_fp = calculate_activation_statistics([fp_imgs], extractor)

    # calibration trajectory (shared across variants)
    xc = jax.random.normal(
        jax.random.PRNGKey(acfg.seed + 2),
        (acfg.calib_batch, cfg.resolution, cfg.resolution, cfg.in_channels),
    )
    _, traj, _ = jax.jit(
        lambda x: ddim_sample(fp_fn, x, seq, sched.betas, keep_trajectory=True)
    )(xc)
    xs_in = jnp.concatenate([xc[None], traj[:-1]], axis=0)

    results: Dict[str, dict] = {}
    for vname, (conv_b, attn_b) in VARIANTS.items():
        t0 = time.time()
        qunet = QuantizedUNet(cfg=cfg, policy=make_variant_policy(cfg, conv_b, attn_b))
        qstates = qunet.init_state(S)
        qstates = calibrate_ranges(qunet, params, qstates, xs_in, seq, first=True)
        qparams, _ = qunet.prepare_params(params)
        imgs = sample_with(qunet.model_fn(qparams, qstates), jax.random.fold_in(key, hash(vname) % 997))
        vdir = os.path.join(out_dir, vname)
        for i in range(min(16, imgs.shape[0])):
            save_image(imgs[i], os.path.join(vdir, f"{i}.png"))
        mu, sig = calculate_activation_statistics([imgs], extractor)
        fid = calculate_frechet_distance(mu_fp, sig_fp, mu, sig)
        entry = {
            "conv_bits": conv_b,
            "attention_bits": attn_b,
            "fid_vs_fp": float(fid),
            "seconds": round(time.time() - t0, 1),
        }
        if clip_scorer is not None:
            entry["clip_score"] = float(clip_scorer(imgs))
        results[vname] = entry
        logging.info(f"{vname}: FID {fid:.3f} ({entry['seconds']}s)")

    with open(os.path.join(out_dir, "ablation_results.yaml"), "w") as f:
        yaml.dump(results, f, default_flow_style=False)
    return results


def main(argv=None):
    import argparse

    from ..config import load_config
    from ..models.torch_convert import load_torch_checkpoint

    ap = argparse.ArgumentParser(description="attention-precision ablation (variants A-D)")
    ap.add_argument("--config", default="cifar10.yml")
    ap.add_argument("--out", default="ablation_out")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--num-samples", type=int, default=64)
    ap.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim"])
    ap.add_argument("--inception-weights", default=None)
    ap.add_argument("--clip-weights", default=None,
                    help="local HuggingFace CLIP checkpoint dir (canonical "
                         "CLIP score; reference ablation_study_attention_"
                         "quantization.py:409-493)")
    ap.add_argument("--clip-random", action="store_true",
                    help="seeded random-init CLIP (zero-egress fallback; "
                         "scores comparable within this run only)")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    config = load_config(args.config)
    cfg = UNetConfig.from_config(config)
    params = load_torch_checkpoint(args.ckpt, cfg) if args.ckpt else None
    extractor = None
    if args.inception_weights:
        from ..eval.inception import InceptionV3FID

        extractor = InceptionV3FID.from_torch(args.inception_weights).extract
    clip_scorer = None
    if args.clip_weights:
        from ..eval.clip_score import make_clip_scorer

        clip_scorer = make_clip_scorer(args.clip_weights)
    elif args.clip_random:
        from ..eval.clip_score import make_random_clip_scorer

        logging.info("CLIP: seeded random-init (within-run comparison only)")
        clip_scorer = make_random_clip_scorer()
    res = run_attention_ablation(
        config,
        args.out,
        params=params,
        extractor=extractor,
        clip_scorer=clip_scorer,
        ablation_cfg=AblationConfig(
            sampler=args.sampler, steps=args.steps, num_samples=args.num_samples
        ),
    )
    print(yaml.dump(res))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
