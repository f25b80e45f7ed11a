"""Training throughput on the real chip — step/s and img/s for CIFAR-10.

VERDICT r3 weak #8: the sharded train step (training.py::make_sharded_train_step,
the same jitted step `main.py --train` drives) was numerics-tested but never
timed on hardware.  This tool measures the production configuration —
cifar10.yml optimizer (Adam + grad_clip 1.0) with EMA — at several batch
sizes, plus the checkpoint save/resume round-trip.

Methodology (axon relay gotchas, CLAUDE.md):
- all timings pull a scalar loss to host INSIDE the timed region
  (`jax.block_until_ready` can return before remote execution finishes);
- the N timed steps are dispatched back-to-back and only the LAST loss is
  pulled — the donated state threads the data dependency through every step,
  so one pull fences the whole chain (same loss-pull-deferred structure as
  the production loop, runners/diffusion.py train());
- host batch assembly is excluded: the production loop overlaps it with
  device compute (threaded prefetch + deferred pull), so device step time is
  the throughput bound.

Reference counterpart: /root/reference/runners/diffusion.py:100-193 (training
loop; the reference publishes no training throughput either — these are the
rebuild's first hardware numbers).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m attentiondm_tpu.tools.train_bench \
        [--batches 128,256,512] [--steps 20] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from .. import checkpoint as ckpt_io
from ..config import load_config
from ..diffusion import DiffusionSchedule
from ..models import UNetConfig, unet_init
from ..parallel import make_mesh, replicate, shard_batch
from ..training import get_optimizer, init_train_state, make_sharded_train_step


def bench_batch(mesh, ucfg, betas, config, batch: int, steps: int, warmup: int = 3):
    tx = get_optimizer(config)
    params = unet_init(jax.random.PRNGKey(0), ucfg)
    state = replicate(mesh, init_train_state(params, tx, use_ema=bool(config.model.ema)))
    step_fn = make_sharded_train_step(
        mesh, ucfg, betas, tx,
        grad_clip=getattr(config.optim, "grad_clip", None),
        ema_rate=config.model.ema_rate if config.model.ema else None,
    )
    rng = np.random.default_rng(0)
    x0 = shard_batch(mesh, jnp.asarray(
        rng.uniform(-1, 1, (batch, ucfg.resolution, ucfg.resolution, 3)), jnp.float32))
    key = jax.random.PRNGKey(1)

    t_c0 = time.time()
    for i in range(warmup):
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, x0, replicate(mesh, sub))
        loss_h = float(loss)  # fence: compile (first) + land steady state
    t_compile = time.time() - t_c0

    t0 = time.time()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, x0, replicate(mesh, sub))
    loss_h = float(loss)  # one pull fences the donated-state chain
    dt = time.time() - t0
    return {
        "batch": batch,
        "steps": steps,
        "step_ms": 1e3 * dt / steps,
        "steps_per_s": steps / dt,
        "img_per_s": batch * steps / dt,
        "loss": loss_h,
        "warmup_s": t_compile,
    }, state


def bench_checkpoint(state, path: str):
    t0 = time.time()
    ckpt_io.save_checkpoint(path, state)
    t_save = time.time() - t0
    size_mb = os.path.getsize(path) / 1e6
    t0 = time.time()
    restored = ckpt_io.load_checkpoint(path, state)
    restored = jax.device_put(restored)
    jax.block_until_ready(restored)
    # prove the round trip with a real device read, not just metadata
    check = float(jax.tree_util.tree_reduce(
        lambda a, b: a + b, jax.tree_util.tree_map(lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)), restored.params)))
    t_load = time.time() - t0
    return {"save_s": t_save, "load_s": t_load, "size_mb": size_mb, "param_l1": check}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="config YAML (default: packaged cifar10.yml)")
    ap.add_argument("--batches", default="128,256,512")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    cfg_path = args.config or os.path.join(os.path.dirname(__file__), "..", "configs", "cifar10.yml")
    config = load_config(cfg_path)
    ucfg = UNetConfig.from_config(config)
    sched = DiffusionSchedule.create(
        config.diffusion.beta_schedule, config.diffusion.beta_start,
        config.diffusion.beta_end, config.diffusion.num_diffusion_timesteps)
    mesh = make_mesh()
    print(f"devices: {jax.devices()}  mesh: {mesh.devices.shape}")

    results = []
    state = None
    for b in [int(x) for x in args.batches.split(",")]:
        r, state = bench_batch(mesh, ucfg, sched.betas, config, b, args.steps)
        print(json.dumps({k: round(v, 4) if isinstance(v, float) else v for k, v in r.items()}))
        results.append(r)

    ck = bench_checkpoint(state, "/tmp/train_bench_ckpt.npz")
    print(json.dumps({k: round(v, 3) for k, v in ck.items()}))

    best = max(results, key=lambda r: r["img_per_s"])
    summary = {"metric": "train_img_per_s_per_chip", "value": round(best["img_per_s"], 2),
               "unit": "img/s/chip", "batch": best["batch"], "step_ms": round(best["step_ms"], 2),
               "checkpoint": {k: round(v, 3) for k, v in ck.items() if k != "param_l1"},
               "results": [{k: round(v, 4) if isinstance(v, float) else v for k, v in r.items()} for r in results]}
    print(json.dumps(summary))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
