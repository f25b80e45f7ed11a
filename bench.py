"""Headline benchmark: images/sec/chip, CIFAR-10 DDIM-100 at W4A8.

Runs the real quantized pipeline on whatever device JAX provides (one TPU
chip under the driver): stage-1 calibration from a small FP teacher
trajectory, then steady-state quantized DDIM-100 sampling at batch 128 (the
single-chip optimum from the round-3 batch sweep).

Baseline: the driver's north star is 50,000 CIFAR-10 images at W4A8 on a
v5e-8 in <10 min => 50000 / 600 / 8 = 10.42 img/s/chip.  vs_baseline is the
ratio of measured throughput to that target (no reference-published numbers
exist — BASELINE.md).

Prints exactly one JSON line.
"""
import json
import numpy as np
import sys
import time

import jax
import os as _os
jax.config.update("jax_compilation_cache_dir", _os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, ".")

from attentiondm_tpu.models import UNetConfig, unet_init, unet_apply
from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges
from attentiondm_tpu.diffusion import DiffusionSchedule, ddim_sample, make_timestep_seq

BASELINE_IMG_PER_SEC_PER_CHIP = 50000 / 600 / 8  # 10.42

def main():
    cfg = UNetConfig()  # CIFAR-10
    params = unet_init(jax.random.PRNGKey(0), cfg)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    steps = 100
    seq = make_timestep_seq(1000, steps, "quad")
    n_chips = max(1, len(jax.devices()))

    # --- calibration (not timed): tiny FP teacher trajectory -> stage-1 ranges
    fp_fn = lambda xt, t, i: unet_apply(params, cfg, xt, t)
    x_small = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    _, traj, _ = jax.jit(
        lambda x: ddim_sample(fp_fn, x, seq, sched.betas, keep_trajectory=True)
    )(x_small)
    xs_in = jnp.concatenate([x_small[None], traj[:-1]], axis=0)

    qunet = QuantizedUNet.create(cfg, bitwidth=4, a_bitwidth=8)  # W4A8
    qstates = qunet.init_state(steps)
    qstates = calibrate_ranges(qunet, params, qstates, xs_in, seq, first=True)

    # --- timed: quantized DDIM-100 sampling on the fused int8 serving path
    # (quant/int8_serving.py — true int8 execution, int8-resident
    # activations).  NOTE: timing pulls a scalar to host each run — under the
    # axon relay, block_until_ready alone returns before execution finishes.
    from attentiondm_tpu.quant.int8_serving import serving_ddim_sampler

    # bf16 residual stream: +18% over f32 residuals; quality-validated by
    # tools/quality_protocol.py (int8_w4a8_bf16res row == int8_w4a8 row to
    # 3 significant digits in eps rel-MSE and PSNR — PERFORMANCE.md).
    # dot_bf16 (conv dequant folded into the XLA epilogue, bf16 into the
    # Pallas resblock epilogue) is default-on since the round-4 lever grid:
    # +3.0% interleaved A/B, <=1 int8 LSB deviation (ab_levers_r4.log).
    #
    # batch 128 is the single-chip throughput optimum (round-3 interleaved
    # sweep over 32..512: 88.9 img/s at 128 vs 75.2 at 256 vs 66.6 at 512 —
    # the smaller per-step working set keeps level-0 activations resident;
    # benchmarks/batch_sweep_r3.log).  Throughput is batch-shape-stable
    # within ±2% across reps; quality is batch-independent.
    batch = 128
    sample = serving_ddim_sampler(
        qunet, params, qstates, seq, sched.betas,
        residual_dtype=jnp.bfloat16, attn_int8=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (batch, 32, 32, 3))
    out_sum = float(sample(x).sum())  # compile
    assert np.isfinite(out_sum), "non-finite samples"

    times = []
    for i in range(3):
        x = jax.random.normal(jax.random.PRNGKey(3 + i), (batch, 32, 32, 3))
        t0 = time.perf_counter()
        s = float(sample(x).sum())
        times.append(time.perf_counter() - t0)
        assert np.isfinite(s)
    best = min(times)
    img_per_sec_per_chip = batch / best / n_chips

    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip (CIFAR-10 DDIM-100, W4A8, batch 128)",
                "value": round(img_per_sec_per_chip, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec_per_chip / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
