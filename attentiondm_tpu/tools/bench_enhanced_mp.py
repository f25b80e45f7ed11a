"""Interleaved A/B: ddim-variant headline vs enhanced+MP attention serving.

VERDICT r4 item #3: the reference's headline attention path —
EnhancedQSelfAttention (self_attention.py:7-153) + MixedPrecisionAttention
(attention_quant_utils.py:5-118) — was equivalence-tested on the serving
engine in round 4 but never benchmarked.  This tool produces the missing
PERFORMANCE.md row: same operating point as bench.py (CIFAR-10 DDIM-100
W4A8 batch 128, bf16 residuals), both variants compiled up front, reps
interleaved A,B,A,B,... in one process so chip-state drift hits both arms.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site \
      python -m attentiondm_tpu.tools.bench_enhanced_mp [--reps 6]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ..diffusion import DiffusionSchedule, ddim_sample, make_timestep_seq
from ..models import UNetConfig, unet_apply, unet_init
from ..quant import QuantizedUNet, calibrate_ranges

BATCH = 128
STEPS = 100


def build_sampler(attn_variant: str, mp: bool):
    from ..quant.int8_serving import serving_ddim_sampler

    cfg = UNetConfig(attn_variant=attn_variant)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = make_timestep_seq(1000, STEPS, "quad")

    fp_fn = lambda xt, t, i: unet_apply(params, cfg, xt, t)
    x_small = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    _, traj, _ = jax.jit(
        lambda x: ddim_sample(fp_fn, x, seq, sched.betas, keep_trajectory=True)
    )(x_small)
    xs_in = jnp.concatenate([x_small[None], traj[:-1]], axis=0)

    qunet = QuantizedUNet.create(cfg, bitwidth=4, a_bitwidth=8)
    qstates = qunet.init_state(STEPS)
    qstates = calibrate_ranges(qunet, params, qstates, xs_in, seq, first=True)

    mp_states = None
    if mp:
        from ..quant import (
            calibrate_mp_attention,
            init_mp_attention_state,
            make_logit_collector,
        )

        imgs = traj[-1]
        collector = make_logit_collector(params, cfg, imgs)
        probe_ts = [0, 250, 500, 750, 999]
        stats0 = collector(probe_ts[0])
        states = {n: init_mp_attention_state(1000) for n in stats0}
        mp_states = calibrate_mp_attention(
            collector, states, base_bits=4, timesteps=probe_ts
        )
        print(f"stage-3 MP calibration: {len(mp_states)} attention layers")

    return serving_ddim_sampler(
        qunet, params, qstates, seq, sched.betas,
        residual_dtype=jnp.bfloat16, attn_int8=False,
        mp_states=mp_states, mp_base_bits=4,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    print(jax.devices())

    arms = {
        "ddim (headline)": build_sampler("ddim", mp=False),
        "enhanced": build_sampler("enhanced", mp=False),
        "enhanced+MP": build_sampler("enhanced", mp=True),
    }
    x = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 32, 32, 3))
    for name, fn in arms.items():
        s = float(fn(x).sum())  # compile
        assert np.isfinite(s), name
        print(f"compiled {name}", flush=True)

    best = {n: np.inf for n in arms}
    for r in range(args.reps):
        for name, fn in arms.items():
            xi = jax.random.normal(jax.random.PRNGKey(10 + r), (BATCH, 32, 32, 3))
            t0 = time.perf_counter()
            s = float(fn(xi).sum())
            dt = time.perf_counter() - t0
            assert np.isfinite(s)
            best[name] = min(best[name], dt)
            print(f"rep {r} {name:18s} {BATCH/dt:7.1f} img/s", flush=True)

    out = {n: round(BATCH / t, 2) for n, t in best.items()}
    base = out["ddim (headline)"]
    print("\nJSON:", json.dumps({
        "img_per_s": out,
        "enhanced_vs_ddim": round(out["enhanced"] / base, 3),
        "enhanced_mp_vs_ddim": round(out["enhanced+MP"] / base, 3),
    }))


if __name__ == "__main__":
    main()
