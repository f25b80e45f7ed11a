"""Serving-throughput sweep: (batch, step_chunk) grid for any config.

The tool behind the round-3 operating-point discoveries (PERFORMANCE.md):
the CIFAR batch sweep that moved the headline 75 -> 89 img/s, and the
big-model fold-once rediscovery (church 0.67 -> 5.25, imagenet64
1.53 -> 49.6 img/s/chip).  Variants are compiled up front and the timing
reps INTERLEAVE across them so chip-state drift through the relay hits
every variant equally; every timing pulls a scalar to host (relay
measurement discipline, PERFORMANCE.md "Measurement methodology").

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python -m \
        attentiondm_tpu.tools.serving_sweep --config church.yml \
        --timesteps 20 --batches 8,16,32 --step_chunks none,5,10

Prints one JSON line per variant plus a winner summary.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def sweep(config_name: str, timesteps: int, batches, step_chunks,
          w_bit: int = 4, a_bit: int = 8, skip_type: str = "quad",
          reps: int = 3, attn_int8: bool = False, seed: int = 0,
          ucfg_override=None):
    from ..config import load_config
    from ..diffusion import DiffusionSchedule, ddim_sample, make_timestep_seq
    from ..models import UNetConfig, unet_apply, unet_init
    from ..quant import QuantizedUNet, calibrate_ranges
    from ..quant.int8_serving import serving_ddim_sampler

    c = load_config(config_name)
    cfg = ucfg_override or UNetConfig.from_config(c)
    params = unet_init(jax.random.PRNGKey(seed), cfg)
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
    sched = DiffusionSchedule.create(
        c.diffusion.beta_schedule, c.diffusion.beta_start, c.diffusion.beta_end,
        c.diffusion.num_diffusion_timesteps,
    )
    seq = make_timestep_seq(c.diffusion.num_diffusion_timesteps, timesteps, skip_type)
    R = cfg.resolution
    print(json.dumps({"config": config_name, "params_M": round(n_par / 1e6, 1),
                      "res": R, "steps": timesteps,
                      "fold_gb_unchunked": round(timesteps * n_par / 1e9, 2)}),
          flush=True)

    @jax.jit
    def teacher(p, x):
        return ddim_sample(lambda xt, t, i: unet_apply(p, cfg, xt, t), x, seq,
                           sched.betas, keep_trajectory=True)

    x_small = jax.random.normal(jax.random.PRNGKey(seed + 1), (1, R, R, 3))
    _, traj, _ = teacher(params, x_small)
    xs_in = jnp.concatenate([x_small[None], traj[:-1]], axis=0)
    qunet = QuantizedUNet.create(cfg, bitwidth=w_bit, a_bitwidth=a_bit)
    qstates = calibrate_ranges(qunet, params, qunet.init_state(timesteps),
                               xs_in, seq, first=True)

    # ONE fold shared across every fold-once batch variant: the fold is
    # S x params int8 (3.5 GB for CIFAR DDIM-100) and depends only on the
    # quant state, not the batch — private per-variant copies would exhaust
    # HBM on any multi-batch sweep of an unchunked config.
    shared_rt = None
    if None in step_chunks:
        from ..quant.int8_serving import prepare_serving_runtime

        shared_rt = prepare_serving_runtime(qunet, params, qstates)

    samplers = {}
    for B in batches:
        for ck in step_chunks:
            try:
                # 'shared' = rank-1 step-shared fold (quant/rank1.py): fold
                # HBM is params-sized at ANY schedule length, no chunking;
                # 'packed' = fold-once with int4-packed weights (HBM halved
                # at w_bit<=4, unpack on the fly — VERDICT r4 item #4)
                s = serving_ddim_sampler(
                    qunet, params, qstates, seq, sched.betas,
                    residual_dtype=jnp.bfloat16, attn_int8=attn_int8,
                    step_chunk=ck if isinstance(ck, int) else None,
                    rank1=(ck == "shared"),
                    pack_int4=(ck == "packed"),
                    runtime=shared_rt if ck is None else None,
                )
                x = jax.random.normal(jax.random.PRNGKey(seed + 2), (B, R, R, 3))
                v = float(s(x).sum())  # compile + fold; host pull = barrier
                assert np.isfinite(v)
                samplers[(B, ck)] = s
            except Exception as e:  # OOM etc: record, keep sweeping
                print(json.dumps({"batch": B, "step_chunk": ck,
                                  "error": str(e)[:160]}), flush=True)

    res = {k: [] for k in samplers}
    dead = set()
    for rep in range(reps):
        for (B, ck), s in samplers.items():
            if (B, ck) in dead:
                continue
            try:
                x = jax.random.normal(jax.random.PRNGKey(seed + 5 + rep), (B, R, R, 3))
                t0 = time.perf_counter()
                v = float(s(x).sum())
                res[(B, ck)].append(B / (time.perf_counter() - t0))
                assert np.isfinite(v)
            except Exception as e:  # run-phase OOM (fragmentation after a
                # failed neighbor): drop the variant, keep the sweep alive
                dead.add((B, ck))
                print(json.dumps({"batch": B, "step_chunk": ck,
                                  "error": str(e)[:160]}), flush=True)
    res = {k: v for k, v in res.items() if v and k not in dead}

    rows = []
    for (B, ck), vals in res.items():
        row = {"batch": B, "step_chunk": ck,
               "img_per_sec": round(max(vals), 3),
               "all": [round(v, 3) for v in vals]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if rows:
        best = max(rows, key=lambda r: r["img_per_sec"])
        print(json.dumps({"winner": best}), flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", required=True, help="e.g. church.yml")
    p.add_argument("--timesteps", type=int, default=20)
    p.add_argument("--batches", default="8,16,32",
                   help="comma-separated batch sizes")
    p.add_argument("--step_chunks", default="none",
                   help="comma-separated chunk sizes; 'none' = fold-once; "
                        "'shared' = rank-1 step-shared fold (params-sized); "
                        "'packed' = fold-once int4-packed (HBM halved)")
    p.add_argument("--bitwidth", type=int, default=4)
    p.add_argument("--a_bitwidth", type=int, default=8)
    p.add_argument("--skip_type", default="quad")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--attn_int8", action="store_true")
    a = p.parse_args(argv)
    batches = [int(b) for b in a.batches.split(",")]
    chunks = [None if c.strip().lower() in ("none", "0")
              else (c.strip().lower() if c.strip().lower() in ("shared", "packed")
                    else int(c))
              for c in a.step_chunks.split(",")]
    sweep(a.config, a.timesteps, batches, chunks, w_bit=a.bitwidth,
          a_bit=a.a_bitwidth, skip_type=a.skip_type, reps=a.reps,
          attn_int8=a.attn_int8)


if __name__ == "__main__":
    main()
