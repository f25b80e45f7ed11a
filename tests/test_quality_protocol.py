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
