"""Interpret-mode (CPU) correctness tests for the int8 Pallas kernels.

Oracle: the int8 path must agree with the float computation on the SAME
quantization grid — fake-quantized activations convolved with the
scale-folded quantized weights.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attentiondm_tpu.ops import int8_matmul, quantized_conv2d_int8, fold_weights_int8
from attentiondm_tpu.ops.quant_conv import _conv3x3_int8_dot
from attentiondm_tpu.quant import fake_quant
from attentiondm_tpu.models.unet import conv2d


def test_int8_matmul_exact():
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 127, (200, 128), dtype=np.int8)
    w = rng.integers(-128, 127, (128, 256), dtype=np.int8)
    out = int8_matmul(jnp.asarray(x), jnp.asarray(w), interpret=True)
    expect = x.astype(np.int32) @ w.astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_int8_matmul_pads_m():
    rng = np.random.default_rng(1)
    x = rng.integers(-10, 10, (33, 128), dtype=np.int8)  # M not tile-aligned
    w = rng.integers(-10, 10, (128, 128), dtype=np.int8)
    out = int8_matmul(jnp.asarray(x), jnp.asarray(w), block_m=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), x.astype(np.int32) @ w.astype(np.int32))


def test_conv3x3_int8_dot_matches_im2col():
    rng = np.random.default_rng(2)
    B, H, W, C, N = 3, 8, 8, 128, 128
    xp = rng.integers(-100, 100, (B, H + 2, W + 2, C), dtype=np.int8)
    wq = rng.integers(-100, 100, (9 * C, N), dtype=np.int8)
    out = _conv3x3_int8_dot(jnp.asarray(xp), jnp.asarray(wq), H, W, C, N, block_b=2, interpret=True)
    # im2col oracle
    patches = np.concatenate(
        [xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)], axis=-1
    ).reshape(B * H * W, 9 * C)
    expect = patches.astype(np.int32) @ wq.astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), expect)


@pytest.mark.parametrize("ksize,abit,wbit", [(1, 8, 8), (3, 8, 8), (3, 8, 4), (1, 6, 6)])
def test_quantized_conv_matches_fakequant_oracle(ksize, abit, wbit):
    rng = np.random.default_rng(3)
    B, H, W, C, co = 2, 8, 8, 64, 32
    x = jnp.asarray(rng.normal(size=(B, H, W, C)) * 2, jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(ksize, ksize, C, co)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    act_min = x.min(axis=(0, 1, 2)) - 0.1
    act_max = x.max(axis=(0, 1, 2)) + 0.1

    out = quantized_conv2d_int8(
        x, kernel, bias, act_min, act_max, abit, wbit, interpret=True
    )

    # oracle: fake-quant activations; weights = s_c * g_hat (the folded
    # quantized weights mapped back to real space)
    n_lv = 2**abit - 1
    s = n_lv / (act_max - act_min)
    xhat = fake_quant(x, abit, act_min, act_max)
    _gq, _ws, _wzp, g_hat = fold_weights_int8(kernel, s, wbit)
    Cp = g_hat.shape[0] // (ksize * ksize)
    Np = g_hat.shape[1]
    g_hat = g_hat.reshape(ksize, ksize, Cp, Np)[:, :, :C, :co]
    weff = g_hat * s.reshape(1, 1, C, 1)
    expect = conv2d(xhat, {"kernel": weff, "bias": bias})

    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=2e-4, atol=2e-3)


def test_quantized_conv_int8_is_close_to_fp():
    """Sanity: at 8/8 bits the int8 conv should track the plain FP conv."""
    rng = np.random.default_rng(4)
    B, H, W, C, co = 2, 8, 8, 64, 64
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, C, co)) * 0.05, jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)
    act_min = x.min(axis=(0, 1, 2))
    act_max = x.max(axis=(0, 1, 2))
    out = quantized_conv2d_int8(x, kernel, bias, act_min, act_max, 8, 8, interpret=True)
    ref = conv2d(x, {"kernel": kernel, "bias": bias})
    rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
    assert rel < 0.02, rel


def test_qunet_int8_mode_tracks_infer_mode():
    """Full quantized UNet in int8 mode vs fake-quant infer mode (CPU
    interpret): same activation grid, weight quant differs by the fold, so
    outputs should agree closely at 8 bits."""
    from attentiondm_tpu.models import UNetConfig, unet_init
    from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges

    cfg = UNetConfig(
        ch=64, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(), resolution=8, dropout=0.0
    )
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, 8)
    S = 2
    qstates = qunet.init_state(S)
    xs = jax.random.normal(jax.random.PRNGKey(1), (S, 2, 8, 8, 3))
    qstates = calibrate_ranges(qunet, params, qstates, xs, [0, 5], first=True)
    qparams, _ = qunet.prepare_params(params)

    x = xs[0]
    t = jnp.full((2,), 5.0)
    out_infer = qunet.apply(qparams, qstates, x, t, 0, mode="infer")
    # int8 mode folds+quantizes weights itself -> pass RAW params
    out_int8 = qunet.apply(params, qstates, x, t, 0, mode="int8")
    rel = float(jnp.abs(out_int8 - out_infer).mean() / (jnp.abs(out_infer).mean() + 1e-9))
    assert rel < 0.1, rel
    assert bool(jnp.isfinite(out_int8).all())


def test_int8_runtime_prefolded_matches_inline():
    """The precomputed-runtime path must equal the inline int8 mode."""
    from attentiondm_tpu.models import UNetConfig, unet_init
    from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges
    from attentiondm_tpu.quant.int8_runtime import prepare_int8_runtime, int8_model_fn

    cfg = UNetConfig(
        ch=64, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(), resolution=8, dropout=0.0
    )
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, 8)
    S = 2
    qstates = qunet.init_state(S)
    xs = jax.random.normal(jax.random.PRNGKey(1), (S, 2, 8, 8, 3))
    qstates = calibrate_ranges(qunet, params, qstates, xs, [0, 5], first=True)
    # mse_search off: inline mode="int8" folds with plain ranges per conv,
    # the exactness contract compares like-for-like (the searched fold is the
    # production serving path, covered by test_int8_serving)
    runtime = prepare_int8_runtime(qunet, params, qstates, symmetric=False, mse_search=False)
    assert runtime  # at least the 64-channel convs are covered

    x = xs[0]
    t = jnp.full((2,), 5.0)
    out_inline = qunet.apply(params, qstates, x, t, 1, mode="int8")
    out_pre = int8_model_fn(qunet, runtime, params, qstates, symmetric=False)(x, t, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_inline), rtol=1e-4, atol=1e-4)


def test_symmetric_fold_close_to_asymmetric():
    """Symmetric weight folding (fast epilogue) stays close to the asymmetric
    oracle at 8 bits on near-symmetric weights."""
    from attentiondm_tpu.ops.quant_conv import quantized_conv2d_int8_prefolded, zcorr_from_fold

    rng = np.random.default_rng(7)
    B, H, W, C, co = 2, 8, 8, 64, 64
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, C, co)) * 0.05, jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)
    amin = x.min(axis=(0, 1, 2)); amax = x.max(axis=(0, 1, 2))
    s = 255.0 / (amax - amin)
    zp = jnp.round(s * amin) + 128

    outs = {}
    for sym in (False, True):
        gq, ws, wzp, g_hat = fold_weights_int8(kernel, s, 8, symmetric=sym)
        zc = zcorr_from_fold(g_hat, zp, 3, C)
        outs[sym] = quantized_conv2d_int8_prefolded(
            x, gq, ws, wzp, zc, bias, s, zp, 8, 3, co, symmetric=sym, interpret=True
        )
        if sym:
            np.testing.assert_array_equal(np.asarray(wzp), 0.0)
    rel = float(jnp.abs(outs[True] - outs[False]).mean() / jnp.abs(outs[False]).mean())
    assert rel < 0.02, rel
