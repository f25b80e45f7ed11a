"""Quality-protocol regression tests (VERDICT r1 item 3).

Pins the W8A8-vs-FP32 gap on a small UNet: stage-1-calibrated 8-bit
fake-quant sampling must stay close to the FP32 trajectory (high PSNR, small
relative eps error), and monotonicity across bitwidths must hold (W4A8 is
worse than W8A8).  The full protocol (trained weights, stage-2, serving
path, real chip) runs via tools/quality_protocol.py — results in
PERFORMANCE.md.
"""
import jax
import numpy as np
import pytest

from attentiondm_tpu.models import UNetConfig, unet_init
from attentiondm_tpu.tools.quality_protocol import format_table, run_protocol

# multi-minute integration file (r5 fast lane: pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = dict(
    ch=64, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
    resolution=16, dropout=0.0,
)


@pytest.fixture(scope="module")
def protocol_rows():
    cfg = UNetConfig(**CFG)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    rows = run_protocol(
        params, cfg, steps=6, batch=4, calib_batch=2,
        stage2=False, serving=False, bf16=True, bit_configs=((8, 8), (4, 8)),
    )
    return rows


def test_w8a8_close_to_fp32(protocol_rows):
    r = protocol_rows["w8a8_s1"]
    assert r["psnr"] > 25.0, protocol_rows
    assert r["eps_rel_mse_mean"] < 0.02, protocol_rows


def test_bitwidth_monotonicity(protocol_rows):
    # more bits must not hurt: W8A8 at least as close to FP32 as W4A8
    assert (
        protocol_rows["w8a8_s1"]["eps_rel_mse_mean"]
        <= protocol_rows["w4a8_s1"]["eps_rel_mse_mean"]
    ), format_table(protocol_rows)
    assert protocol_rows["w8a8_s1"]["psnr"] >= protocol_rows["w4a8_s1"]["psnr"] - 1.0


def test_bf16_negligible_vs_fp32(protocol_rows):
    # bf16 execution is a rounding-level perturbation, far smaller than W4A8
    r = protocol_rows["bf16"]
    assert r["eps_rel_mse_mean"] < protocol_rows["w4a8_s1"]["eps_rel_mse_mean"]
    assert r["psnr"] > 25.0, protocol_rows


def test_kid_proxy_discriminates_degenerate_scale_features():
    """kid_proxy must stay discriminative when the extractor's features are
    collapsed in SCALE (the random-Inception case measured at ~1e-19): the
    standardization rescues relative variation; same-distribution pairs read
    ~0 and disjoint distributions read >> 0, at any feature scale."""
    import numpy as np
    from attentiondm_tpu.tools.quality_protocol import kid_proxy

    rng = np.random.default_rng(0)
    for scale in (1.0, 1e-19):
        a = rng.normal(size=(24, 64)) * scale
        a2 = rng.normal(size=(24, 64)) * scale
        b = (rng.normal(size=(24, 64)) + 3.0) * scale  # shifted distribution
        same = abs(kid_proxy(a, a2))
        diff = kid_proxy(b, a)
        assert np.isfinite(same) and np.isfinite(diff)
        assert diff > 10.0 * max(same, 1e-9), (scale, same, diff)


def test_stage2_multi_epoch_moves_alphas_more():
    """epochs=3 must apply 3x the optimizer updates of the reference's
    single pass (losses length) and move alpha_logits further."""
    import jax.numpy as jnp
    from attentiondm_tpu.diffusion import DiffusionSchedule
    from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges
    from attentiondm_tpu.quant.calibrate import calibrate_differentiable
    from attentiondm_tpu.models import unet_init

    cfg = UNetConfig(ch=64, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(8,),
                     resolution=8, dropout=0.0)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = [0, 500]
    qunet = QuantizedUNet.create(cfg, 8)
    qs = qunet.init_state(2)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 8, 8, 3))
    qs = calibrate_ranges(qunet, params, qs, xs, seq, first=True)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))

    moved = {}
    for ep in (1, 3):
        qs2, losses = calibrate_differentiable(
            qunet, params, qs, x0, seq, sched.betas,
            key=jax.random.PRNGKey(3), epochs=ep,
        )
        assert len(losses) == 2 * ep
        moved[ep] = sum(
            float(jnp.abs(qs2[n].alpha_logits - qs[n].alpha_logits).sum()) for n in qs
        )
    assert moved[3] > moved[1]


def test_round3_rows_present_and_finite():
    """AdaRound / bias-correction / teacher-matched rows (round 3) run end
    to end on a tiny model and produce finite metrics."""
    cfg = UNetConfig(**CFG)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    rows = run_protocol(
        params, cfg, steps=4, batch=2, calib_batch=2,
        stage2=False, serving=True, bf16=False, bit_configs=((4, 8),),
        adaround=True, adaround_iters=30, stage2_teacher=True,
    )
    for want in ("int8_w4a8", "int8_w4a8_bc", "int8_w4a8_ar",
                 "int8_w4a8_ar_refine", "int8_w4a8_gptq",
                 "int8_w4a8_gptq_refine", "int8_w4a8_ar_s2srv", "w4a8_s12t"):
        assert want in rows, sorted(rows)
        assert np.isfinite(rows[want]["eps_rel_mse_mean"]), (want, rows[want])
    # teacher-matched stage 2 must not make things worse on its own metric
    assert rows["w4a8_s12t"]["eps_rel_mse_mean"] <= rows["w4a8_s1"]["eps_rel_mse_mean"] * 1.05
