"""Differentiable architecture-importance search (lambda/eta sweep).

Rebuild of `ablation_study.py` (DiffSearchAblation, :8-127) + the intent of
`main_ablation.py` (which imported modules that never existed, defect D10):
learn sigmoid-gated importance weights over {resblocks, attention,
time-embedding} by minimizing eps-MSE + lambda * L1(sparsity), sweeping
(lambda, eta) pairs; record weight trajectories for visualization.

The gates plug into `unet_apply(gates=...)` — residual-branch scaling, the
functional equivalent of the reference's forward_with_weights
(models/diffusion.py:384-405).
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import optax

from ..models.unet import UNetConfig, unet_apply
from ..models import unet_init
from ..diffusion.losses import noise_estimation_loss


def run_diff_search(
    config,
    out_dir: str,
    *,
    params=None,
    lambdas: Sequence[float] = (0.01, 0.1),
    etas: Sequence[float] = (0.01, 0.05),
    steps: int = 20,
    batch: int = 4,
    seed: int = 0,
) -> Dict[str, dict]:
    cfg = UNetConfig.from_config(config)
    from ..diffusion import DiffusionSchedule

    sched = DiffusionSchedule.from_config(config)
    if params is None:
        params = unet_init(jax.random.PRNGKey(seed), cfg)
    os.makedirs(out_dir, exist_ok=True)

    x0 = jax.random.normal(
        jax.random.PRNGKey(seed + 1), (batch, cfg.resolution, cfg.resolution, cfg.in_channels)
    )

    def loss_fn(logits, key, lam):
        gates = {k: jax.nn.sigmoid(v) for k, v in logits.items()}
        kt, ke = jax.random.split(key)
        t = jax.random.randint(kt, (batch,), 0, sched.num_timesteps)
        e = jax.random.normal(ke, x0.shape)
        mse, _ = noise_estimation_loss(
            lambda x, tt: unet_apply(params, cfg, x, tt, gates=gates), x0, t, e, sched.betas
        )
        sparsity = sum(jnp.abs(g).sum() for g in gates.values())
        return mse + lam * sparsity

    results = {}
    for lam in lambdas:
        for eta in etas:
            logits = {
                "resblock": jnp.zeros(()),
                "attention": jnp.zeros(()),
                "temb": jnp.zeros(()),
            }
            opt = optax.adam(eta)
            opt_state = opt.init(logits)

            @jax.jit
            def step(logits, opt_state, key):
                l, g = jax.value_and_grad(lambda lg: loss_fn(lg, key, lam))(logits)
                upd, opt_state = opt.update(g, opt_state)
                return optax.apply_updates(logits, upd), opt_state, l

            hist = {k: [] for k in logits}
            losses = []
            for i in range(steps):
                logits, opt_state, l = step(logits, opt_state, jax.random.fold_in(jax.random.PRNGKey(seed + 2), i))
                losses.append(float(l))
                for k in logits:
                    hist[k].append(float(jax.nn.sigmoid(logits[k])))
            key_name = f"lambda={lam}_eta={eta}"
            results[key_name] = {
                "final_weights": {k: hist[k][-1] for k in hist},
                "loss": losses,
                "weights_evolution": hist,
            }
            logging.info(f"{key_name}: final gates {results[key_name]['final_weights']}")

    _plot_evolution(results, os.path.join(out_dir, "weights_evolution.png"))
    import json

    with open(os.path.join(out_dir, "diff_search_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


def _plot_evolution(results, out_path):
    """Weight-trajectory panels (reference visualize_weights_evolution,
    ablation_study.py:81-115)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(results)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3), squeeze=False)
    for ax, (name, r) in zip(axes[0], results.items()):
        for comp, ys in r["weights_evolution"].items():
            ax.plot(ys, label=comp)
        ax.set_title(name, fontsize=8)
        ax.set_xlabel("step")
        ax.set_ylabel("gate")
        ax.legend(fontsize=6)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def main(argv=None):
    import argparse

    from ..config import load_config

    ap = argparse.ArgumentParser(description="differentiable architecture-importance search")
    ap.add_argument("--config", default="ablation_config.yml")
    ap.add_argument("--out", default="diff_search_out")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    run_diff_search(load_config(args.config), args.out, steps=args.steps)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
