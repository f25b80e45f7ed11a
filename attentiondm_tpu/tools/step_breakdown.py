"""Serving-step cost breakdown at the HEADLINE operating point (real chip).

Times the full W4A8 CIFAR-10 serving sampler at batch 128 (bench.py's
config), then re-times it with individual components stubbed out, in the
SAME process (interleaved — chip-state variance through the axon relay is
~±10% across processes but ~±2% within one).  The deltas attribute step
time to: attention blocks, resblock entry (GN+quant), Pallas epilogues,
DDIM update, and the conv core (the remainder).

The stubs change numerics, not shapes — they are timing instruments only:
  - attn=identity        : attention sites return their input
  - entry=quantize-only  : resblock entry skips the GN stats + normalize
  - epilogue=xla         : the Pallas int32->GN->swish->int8 epilogue is
                           replaced by the XLA two-pass fallback
  - unet=identity        : the whole UNet is `x -> x` (scan + DDIM update
                           + dispatch floor)

Every timing pulls a scalar to host (relay discipline, PERFORMANCE.md).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m attentiondm_tpu.tools.step_breakdown
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


def build(variant: str):
    """Build the bench-equivalent sampler with one component stubbed."""
    from ..diffusion import DiffusionSchedule, ddim_sample, make_timestep_seq
    from ..models import UNetConfig, unet_apply, unet_init
    from ..quant import QuantizedUNet, calibrate_ranges
    from ..quant import int8_serving as srv

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

    # --- stubs (module-level monkeypatches; resolved at trace time) -------
    orig_attn = srv._attn_fused
    orig_entry = srv.gn_act_quant_xla
    import attentiondm_tpu.ops.fused_gn as fg

    orig_epi = fg.epilogue_gn_swish_quant

    if variant == "attn=identity":
        srv._attn_fused = lambda name, p, h, *a, **k: h
    elif variant == "entry=quantize-only":
        def entry_stub(x, gn_p, quant_params, *, act="swish", num_groups=32, sums=None):
            xf = x.astype(jnp.float32)
            return tuple(srv._quant_i8(xf, s, z, b) for (s, z, b) in quant_params)

        srv.gn_act_quant_xla = entry_stub
    elif variant == "epilogue=xla":
        def epi_stub(dot, inv_ws, zcbias, temb, gn_scale, gn_bias, scale, zp, a_bit, **kw):
            out = dot.astype(jnp.float32) * inv_ws + zcbias + temb[:, None, None, :]
            mean, rstd = srv._gn_stats(out)
            h = srv._gn_apply(out, mean, rstd, gn_scale.astype(jnp.float32),
                              gn_bias.astype(jnp.float32))
            h = h * jax.nn.sigmoid(h)
            return srv._quant_i8(h, scale, zp, a_bit)

        fg.epilogue_gn_swish_quant = epi_stub
        # the serving module imported the symbol by name
        srv.epilogue_gn_swish_quant = epi_stub

    # NOTE: jit traces lazily — the first (compile) call MUST happen inside
    # the patched scope or the stubs never make it into the traced graph.
    try:
        if variant == "unet=identity":
            from ..diffusion.sampling import _seq_alphas, ddim_step

            t_rev, _, at, at_next = _seq_alphas(sched.betas, seq)

            @jax.jit
            def sample(x):
                def body(xt, inp):
                    t_i, at_i, atn_i = inp
                    xt_next, _ = ddim_step(xt, xt, at_i, atn_i, 0.0, jnp.zeros_like(xt))
                    return xt_next, None

                out, _ = jax.lax.scan(body, x, (t_rev.astype(jnp.float32), at, at_next))
                return out
        else:
            sample = srv.serving_ddim_sampler(
                qunet, params, qstates, seq, sched.betas,
                residual_dtype=jnp.bfloat16, attn_int8=False,
            )
        # compile now, while the stubs are live
        xw = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 32, 32, 3))
        float(sample(xw).sum())
    finally:
        srv._attn_fused = orig_attn
        srv.gn_act_quant_xla = orig_entry
        fg.epilogue_gn_swish_quant = orig_epi
        srv.epilogue_gn_swish_quant = orig_epi
    return sample


def timeit(sample) -> float:
    x = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 32, 32, 3))
    s = float(sample(x).sum())  # compile
    assert np.isfinite(s) or True  # stubs may change values, not finiteness
    best = np.inf
    for i in range(REPS):
        x = jax.random.normal(jax.random.PRNGKey(3 + i), (BATCH, 32, 32, 3))
        t0 = time.perf_counter()
        float(sample(x).sum())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(jax.devices())
    variants = [
        "full",
        "attn=identity",
        "entry=quantize-only",
        "epilogue=xla",
        "unet=identity",
    ]
    results = {}
    samplers = {v: build(v) for v in variants}
    # interleave timing rounds so chip-state drift hits all variants equally
    for rnd in range(2):
        for v in variants:
            t = timeit(samplers[v])
            results[v] = min(results.get(v, np.inf), t)
            print(f"[round {rnd}] {v:24s} {t*1e3:8.1f} ms/traj "
                  f"({BATCH/t:6.1f} img/s)")
    full = results["full"]
    print("\n=== attribution (ms per UNet step, batch %d) ===" % BATCH)
    print(f"{'full step':28s} {full/STEPS*1e3:7.3f}")
    for v in variants[1:]:
        d = (full - results[v]) / STEPS * 1e3
        print(f"{'Δ ' + v:28s} {d:7.3f}")


if __name__ == "__main__":
    main()
