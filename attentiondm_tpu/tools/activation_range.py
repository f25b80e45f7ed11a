"""Activation / weight / attention range analysis.

Functional rebuild of the reference's `activation_range_analysis/` package
(activation_range.py:9-197 hook-based per-timestep layer stats;
run_activation_analysis.py:10-191 Q-Diffusion-style weight-range boxplots;
self_attention_analysis.py:11-446 attention q/k/v/logit/output ranges and
heatmaps).  Hooks are replaced by interception at the UNet conv chokepoint
and the attention `collect` context — stats come out of jitted forwards as
regular outputs.

Outputs: plain dict reports (JSON/CSV-able) + optional matplotlib plots.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import UNetConfig, unet_apply, conv2d, iter_conv_layers


# ---------------------------------------------------------------------------
# collection
# ---------------------------------------------------------------------------


def collect_activation_ranges(
    params,
    cfg: UNetConfig,
    x: jax.Array,
    timesteps: Sequence[int],
) -> Dict[str, Dict[str, np.ndarray]]:
    """Per-conv input stats (min/max/mean/std) at each probe timestep.

    Returns {layer: {stat: [T_probe]}} (reference ActivationHook collected
    the same four stats, activation_range.py:9-37).
    """
    n = x.shape[0]

    @jax.jit
    def probe(p, xin_, t_scalar):
        stats = {}

        def spy(name, xin, pp, *, stride=1, padding="SAME"):
            stats[name] = (xin.min(), xin.max(), xin.mean(), xin.std())
            return conv2d(xin, pp, stride=stride, padding=padding)

        unet_apply(p, cfg, xin_, jnp.full((n,), t_scalar), conv_apply=spy)
        return stats

    out: Dict[str, Dict[str, list]] = {}
    for t in timesteps:
        stats = jax.device_get(probe(params, x, jnp.asarray(float(t))))
        for name, (mn, mx, mean, std) in stats.items():
            d = out.setdefault(name, {"min": [], "max": [], "mean": [], "std": []})
            d["min"].append(float(mn))
            d["max"].append(float(mx))
            d["mean"].append(float(mean))
            d["std"].append(float(std))
    return {k: {s: np.asarray(v) for s, v in d.items()} for k, d in out.items()}


def collect_weight_ranges(params, cfg: UNetConfig) -> Dict[str, Dict[str, float]]:
    """Per-conv weight range stats (the Q-Diffusion-style boxplot data,
    run_activation_analysis.py:60-140): min/max plus per-output-channel
    quartiles of |w|."""
    out = {}
    for name, _cin, _k in iter_conv_layers(cfg):
        node = params
        for p in name.split("."):
            node = node[int(p)] if isinstance(node, list) else node[p]
        w = np.asarray(node["kernel"])
        per_out = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
        out[name] = {
            "min": float(w.min()),
            "max": float(w.max()),
            "absmax_q25": float(np.quantile(per_out, 0.25)),
            "absmax_q50": float(np.quantile(per_out, 0.50)),
            "absmax_q75": float(np.quantile(per_out, 0.75)),
            "absmax_max": float(per_out.max()),
        }
    return out


def collect_attention_ranges(
    params,
    cfg: UNetConfig,
    x: jax.Array,
    timesteps: Sequence[int],
) -> Dict[str, Dict[str, np.ndarray]]:
    """Attention-specific ranges per probe timestep: q/k/v projection inputs,
    attention logits, and output-projection inputs
    (reference SelfAttentionHook, self_attention_analysis.py:11-92)."""
    n = x.shape[0]

    @jax.jit
    def probe(p_, xin_, t_scalar):
        conv_stats = {}
        attn_stats: dict = {}

        def spy(name, xin, p, *, stride=1, padding="SAME"):
            leaf = name.rsplit(".", 1)[-1]
            if leaf in ("q", "k", "v", "proj_out", "query_conv", "key_conv", "value_conv", "output_conv"):
                conv_stats[name] = (xin.min(), xin.max())
            return conv2d(xin, p, stride=stride, padding=padding)

        unet_apply(
            p_,
            cfg,
            xin_,
            jnp.full((n,), t_scalar),
            conv_apply=spy,
            attn_ctx={"collect": attn_stats} if cfg.attn_variant == "enhanced" else None,
        )
        return conv_stats, attn_stats

    out: Dict[str, Dict[str, list]] = {}
    for t in timesteps:
        conv_stats, attn_stats = jax.device_get(probe(params, x, jnp.asarray(float(t))))
        for name, (mn, mx) in {**conv_stats, **{f"{k}.logits": v for k, v in attn_stats.items()}}.items():
            d = out.setdefault(name, {"min": [], "max": []})
            d["min"].append(float(mn))
            d["max"].append(float(mx))
    return {k: {s: np.asarray(v) for s, v in d.items()} for k, d in out.items()}


def save_range_report(report: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    serializable = jax.tree_util.tree_map(
        lambda v: v.tolist() if isinstance(v, np.ndarray) else v, report
    )
    with open(path, "w") as f:
        json.dump(serializable, f, indent=1)


# ---------------------------------------------------------------------------
# plots (matplotlib, Agg backend)
# ---------------------------------------------------------------------------


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_activation_ranges(report, timesteps, out_path, max_layers=16):
    """Per-layer min/max envelopes over timesteps
    (reference plot_activation_ranges, activation_range.py:128-197)."""
    plt = _plt()
    names = list(report)[:max_layers]
    ncol = 4
    nrow = (len(names) + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 2.5 * nrow), squeeze=False)
    for i, name in enumerate(names):
        ax = axes[i // ncol][i % ncol]
        d = report[name]
        ax.fill_between(timesteps, d["min"], d["max"], alpha=0.4)
        if "mean" in d:
            ax.plot(timesteps, d["mean"])
        ax.set_title(name, fontsize=7)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def plot_weight_ranges_qdiffusion_style(wreport, out_path):
    """Per-layer |w| quartile boxes (run_activation_analysis.py:143-191)."""
    plt = _plt()
    names = list(wreport)
    q25 = [wreport[n]["absmax_q25"] for n in names]
    q50 = [wreport[n]["absmax_q50"] for n in names]
    q75 = [wreport[n]["absmax_q75"] for n in names]
    mx = [wreport[n]["absmax_max"] for n in names]
    fig, ax = plt.subplots(figsize=(max(8, len(names) * 0.3), 4))
    xs = np.arange(len(names))
    ax.fill_between(xs, q25, q75, alpha=0.5, label="|w| out-channel IQR")
    ax.plot(xs, q50, label="median")
    ax.plot(xs, mx, ".", label="max")
    ax.set_yscale("log")
    ax.set_xticks(xs[:: max(1, len(names) // 40)])
    ax.set_xticklabels(names[:: max(1, len(names) // 40)], rotation=90, fontsize=5)
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_attention_heatmaps(report, timesteps, out_path):
    """Layer x timestep heatmap of attention range widths
    (self_attention_analysis.py:212-333)."""
    plt = _plt()
    names = list(report)
    mat = np.stack([np.asarray(report[n]["max"]) - np.asarray(report[n]["min"]) for n in names])
    fig, ax = plt.subplots(figsize=(8, max(3, len(names) * 0.25)))
    im = ax.imshow(mat, aspect="auto", cmap="viridis")
    ax.set_yticks(range(len(names)))
    ax.set_yticklabels(names, fontsize=5)
    ax.set_xticks(range(len(timesteps)))
    ax.set_xticklabels(timesteps, fontsize=6)
    ax.set_xlabel("timestep")
    fig.colorbar(im, ax=ax, label="range width")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def cross_model_comparison(
    model_reports: Dict[str, Dict[str, Dict[str, np.ndarray]]],
    timesteps: Sequence[int],
    out_dir: str,
) -> dict:
    """Compare attention ranges ACROSS models (working equivalent of the
    reference's `cross_model_comparison`, self_attention_analysis.py:371-446,
    which is dead-on-arrival there — its `load_models` imports phantom
    modules, defect D10).

    `model_reports` maps model name -> `collect_attention_ranges` output.
    Produces (a) a bar chart of each model's mean attention-OUTPUT range
    (max - min of the output-projection input, averaged over layers and
    probe timesteps, std across layers — the reference's statistic), (b) the
    per-timestep range pattern of each model's first attention layer, and a
    JSON with both.  Returns the summary dict.
    """
    os.makedirs(out_dir, exist_ok=True)
    summary: dict = {"avg_output_ranges": {}, "timestep_patterns": {}}
    for model, rep in model_reports.items():
        layer_means = []
        first_pattern = None
        for name in sorted(rep):
            if not name.endswith(("proj_out", "output_conv")):
                continue
            rng = np.asarray(rep[name]["max"]) - np.asarray(rep[name]["min"])  # [T]
            layer_means.append(float(rng.mean()))
            if first_pattern is None:
                first_pattern = rng.tolist()
        if layer_means:
            summary["avg_output_ranges"][model] = {
                "mean": float(np.mean(layer_means)),
                "std": float(np.std(layer_means)),
            }
            summary["timestep_patterns"][model] = first_pattern

    plt = _plt()
    if plt is not None and summary["avg_output_ranges"]:
        models = list(summary["avg_output_ranges"])
        means = [summary["avg_output_ranges"][m]["mean"] for m in models]
        stds = [summary["avg_output_ranges"][m]["std"] for m in models]
        fig, ax = plt.subplots(figsize=(10, 6))
        xpos = np.arange(len(models))
        ax.bar(xpos, means, yerr=stds, capsize=5)
        ax.set_xticks(xpos)
        ax.set_xticklabels(models)
        ax.set_xlabel("Model")
        ax.set_ylabel("Average Output Range (Max - Min)")
        ax.set_title("Self-Attention Output Ranges Across Models")
        ax.grid(True, axis="y", linestyle="--", alpha=0.7)
        fig.savefig(os.path.join(out_dir, "model_comparison_output_ranges.png"), dpi=150)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(12, 8))
        for m, pat in summary["timestep_patterns"].items():
            if pat:
                ax.plot(list(timesteps), pat, label=m)
        ax.set_xlabel("Timestep")
        ax.set_ylabel("Output Range (Max - Min)")
        ax.set_title("Self-Attention Output Range Patterns Across Timesteps")
        ax.grid(True, linestyle="--", alpha=0.7)
        ax.legend()
        fig.savefig(os.path.join(out_dir, "timestep_pattern_comparison.png"), dpi=150)
        plt.close(fig)

    save_range_report(summary, os.path.join(out_dir, "cross_model_comparison.json"))
    return summary


def main(argv=None):
    """CLI: analyze a model's activation/weight/attention ranges.

    python -m attentiondm_tpu.tools.activation_range --config cifar10.yml \
        [--ckpt path] [--out analysis_out] [--timesteps 0,250,500,750,999]

    Cross-model mode: --compare cifar10.yml,celeba.yml[,...] analyzes each
    config's attention ranges and emits the comparison plots + JSON.
    """
    import argparse

    from ..config import load_config
    from ..models import unet_init
    from ..models.torch_convert import load_torch_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="required unless --compare")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="analysis_out")
    ap.add_argument("--timesteps", default="0,250,500,750,999")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--enhanced", action="store_true", help="analyze the enhanced-attention variant")
    ap.add_argument("--compare", default=None,
                    help="comma-separated configs for cross-model attention comparison")
    args = ap.parse_args(argv)

    if not args.compare and not args.config:
        ap.error("--config is required unless --compare is given")
    ts = [int(t) for t in args.timesteps.split(",")]
    if args.compare:
        reports = {}
        for cfg_path in args.compare.split(","):
            config = load_config(cfg_path)
            cfg = UNetConfig.from_config(config)
            params = unet_init(jax.random.PRNGKey(0), cfg)
            x = jax.random.normal(
                jax.random.PRNGKey(1),
                (args.batch, cfg.resolution, cfg.resolution, cfg.in_channels),
            )
            name = os.path.splitext(os.path.basename(cfg_path))[0]
            reports[name] = collect_attention_ranges(params, cfg, x, ts)
        cross_model_comparison(reports, ts, args.out)
        print(f"cross-model comparison written to {args.out}/")
        return 0

    config = load_config(args.config)
    cfg = UNetConfig.from_config(config)
    if args.enhanced:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, attn_variant="enhanced")
    params = (
        load_torch_checkpoint(args.ckpt, cfg)
        if args.ckpt
        else unet_init(jax.random.PRNGKey(0), cfg)
    )
    ts = [int(t) for t in args.timesteps.split(",")]
    x = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, cfg.resolution, cfg.resolution, cfg.in_channels)
    )

    act = collect_activation_ranges(params, cfg, x, ts)
    save_range_report(act, os.path.join(args.out, "activation_ranges.json"))
    plot_activation_ranges(act, ts, os.path.join(args.out, "activation_ranges.png"))

    wr = collect_weight_ranges(params, cfg)
    save_range_report(wr, os.path.join(args.out, "weight_ranges.json"))
    plot_weight_ranges_qdiffusion_style(wr, os.path.join(args.out, "weight_ranges.png"))

    ar = collect_attention_ranges(params, cfg, x, ts)
    save_range_report(ar, os.path.join(args.out, "attention_ranges.json"))
    plot_attention_heatmaps(ar, ts, os.path.join(args.out, "attention_heatmap.png"))
    print(f"analysis written to {args.out}/")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
