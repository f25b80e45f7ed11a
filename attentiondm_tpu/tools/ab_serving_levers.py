"""Same-process A/B of serving-path HBM levers at the headline operating point.

Variants (CIFAR-10 DDIM-100 W4A8 batch 128, bf16 residual stream):
  base          — current defaults (int32 conv->Pallas epilogue, XLA two-pass
                  GN entry)
  dot_bf16      — fold per-channel dequant+bias into the conv's XLA output
                  fusion; the Pallas resblock epilogues read bf16 instead of
                  the int32 accumulator (conv->epilogue round trip halves)
  entry_pallas  — resblock/conv_out GN entry via the one-pass Pallas kernel
                  (ops/fused_gn.gn_act_quant): ONE bf16 read of the residual
                  instead of XLA's stats-pass + normalize-pass
  both          — the two combined
  bf / bf+...   — the same with boundary_fusion=True (exit kernel emits the
                  next entry's GN sums), so each lever is ALSO measured at
                  the operating point where the entry is already one-pass
                  (ADVICE r3: entry_pallas buys nothing once sums exist —
                  verify that claim instead of assuming it)

All variants are compiled up front and the timing reps interleave so
chip-state drift through the axon relay hits every variant equally; every
timing pulls a scalar to host (relay measurement discipline,
PERFORMANCE.md).  Also prints each variant's mean-rel deviation from base on
final images (the levers round at <= one 8-bit activation LSB).

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python -m attentiondm_tpu.tools.ab_serving_levers
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BATCH = 128
STEPS = 100
REPS = 3

VARIANTS = {
    # NOTE: dot_bf16 has been default-ON since the round-4 grid — "base" is
    # the shipping config; "no_dot_bf16" re-checks the r4 decision.
    "base": dict(),
    "dot_bf16": dict(dot_bf16=True),
    "entry_pallas": dict(entry_pallas=True),
    "both": dict(dot_bf16=True, entry_pallas=True),
    "bf": dict(boundary_fusion=True),
    "bf+dot_bf16": dict(boundary_fusion=True, dot_bf16=True),
    "bf+both": dict(boundary_fusion=True, dot_bf16=True, entry_pallas=True),
    # round-5: the implicit-im2col Pallas conv kernel (ops/pallas_conv.py),
    # measured per-shape routing (conv3_pallas_wins); "conv_pallas_all"
    # ignores the win table (routes every eligible shape) as a control.
    "conv_pallas": dict(conv_pallas=True),
    "conv_pallas_all": dict(conv_pallas="all"),
    # surgical single-shape routes: quantify the in-graph custom-call
    # boundary cost against the isolated per-shape win
    "cp16": dict(conv_pallas=((16, 256, 256),)),
    "cp8": dict(conv_pallas=((8, 256, 256),)),
    # round-5: whole-resblock mega-kernel (ops/pallas_resblock.py) on
    # identity-residual blocks — glue saving measured separately from and
    # composed with the conv routing
    "rb": dict(resblock_pallas=True),
    "rb_all": dict(resblock_pallas="all"),
    "conv_pallas+rb": dict(conv_pallas=True, resblock_pallas=True),
    "no_dot_bf16": dict(dot_bf16=False),
}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset of VARIANTS (default: all); "
                         "'base' is always included")
    args = ap.parse_args()
    global VARIANTS
    if args.variants:
        keep = {"base"} | set(args.variants.split(","))
        VARIANTS = {k: v for k, v in VARIANTS.items() if k in keep}
    from ..diffusion import DiffusionSchedule, ddim_sample, make_timestep_seq
    from ..models import UNetConfig, unet_apply, unet_init
    from ..quant import QuantizedUNet, calibrate_ranges
    from ..quant.int8_serving import prepare_serving_runtime, serving_ddim_sampler

    print(jax.devices())
    cfg = UNetConfig()
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
    qstates = calibrate_ranges(qunet, params, qunet.init_state(STEPS), xs_in, seq, first=True)

    # ONE shared fold across all variants — the levers only change the
    # compute path, and 7 private ~3.5 GB runtimes would exhaust HBM
    rt = prepare_serving_runtime(qunet, params, qstates)
    samplers = {}
    for name, kw in VARIANTS.items():
        samplers[name] = serving_ddim_sampler(
            qunet, params, qstates, seq, sched.betas,
            residual_dtype=jnp.bfloat16, attn_int8=False, runtime=rt, **kw,
        )
        x = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 32, 32, 3))
        s = float(samplers[name](x).sum())  # compile; host pull = barrier
        assert np.isfinite(s), (name, s)
        print(f"compiled {name}", flush=True)

    x0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 32, 32, 3))
    ref = np.asarray(samplers["base"](x0))
    for name in list(VARIANTS)[1:]:
        out = np.asarray(samplers[name](x0))
        rel = float(np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9))
        print(f"mean-rel |{name} - base| on final images: {rel:.3e}")

    best = {name: np.inf for name in VARIANTS}
    for rep in range(2 * REPS):
        for name in VARIANTS:
            x = jax.random.normal(jax.random.PRNGKey(3 + rep), (BATCH, 32, 32, 3))
            t0 = time.perf_counter()
            float(samplers[name](x).sum())
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"[rep {rep}] {name:13s} {dt*1e3:8.1f} ms ({BATCH/dt:6.1f} img/s)",
                  flush=True)
    base = BATCH / best["base"]
    print()
    for name in VARIANTS:
        v = BATCH / best[name]
        print(f"{name:13s} {v:6.1f} img/s  ({(v/base - 1)*100:+.1f}% vs base)")


if __name__ == "__main__":
    main()
