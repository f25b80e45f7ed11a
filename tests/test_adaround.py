"""AdaRound + bias correction (quant/adaround.py) — CPU tests.

Covers: im2col/fold row-order agreement, the rounding optimization beating
round-to-nearest on its own objective, fold equivalence when offsets encode
round-to-nearest, and the end-to-end serving-path quality gain at W4A8.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentiondm_tpu.models import UNetConfig, unet_init, unet_apply
from attentiondm_tpu.ops.quant_conv import fold_weights_int8
from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges
from attentiondm_tpu.quant.adaround import (
    _adaround_opt,
    _im2col,
    collect_conv_stats,
    compute_weight_extras,
)
from attentiondm_tpu.quant.int8_serving import prepare_serving_runtime, serving_model_fn

# multi-minute integration file (r5 fast lane: pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _setup(w_bit=4, a_bit=8, ch=128, res=8, steps=2):
    cfg = UNetConfig(
        ch=ch, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(8,),
        resolution=res, dropout=0.0,
    )
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, w_bit, a_bitwidth=a_bit)
    qstates = qunet.init_state(steps)
    xs = jax.random.normal(jax.random.PRNGKey(1), (steps, 2, res, res, 3))
    seq = list(np.linspace(0, 900, steps).astype(int))
    qstates = calibrate_ranges(qunet, params, qstates, xs, seq, first=True)
    return cfg, params, qunet, qstates, xs, seq


def test_im2col_matches_conv():
    """patches @ flat(HWIO kernel) == SAME conv — the row-order contract the
    Gram/mu share with ops/quant_conv.fold_weights_int8."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 6, 6, 5))
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 5, 7))
    pat = _im2col(x, 3)  # [M, 45]
    got = (pat @ w.reshape(45, 7)).reshape(2, 6, 6, 7)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_adaround_beats_rtn_on_objective():
    """The learned offsets must not lose to round-to-nearest on the Gram
    objective they optimize (strictly better in the typical case)."""
    key = jax.random.PRNGKey(0)
    K, N = 64, 32
    g = jax.random.normal(key, (K, N)) * 0.1
    # correlated inputs (low-rank + noise): with iid inputs the Gram is ~I and
    # round-to-nearest is already optimal — correlation is where AdaRound wins
    Z = jax.random.normal(jax.random.fold_in(key, 1), (256, 8))
    A = jax.random.normal(jax.random.fold_in(key, 2), (8, K))
    X = Z @ A + 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (256, K))
    gram = X.T @ X / 256.0
    shrink = jnp.ones((N,))
    h = _adaround_opt(g, gram, shrink, w_bit=4, symmetric=True, iters=300)
    assert set(np.unique(np.asarray(h))) <= {0.0, 1.0}

    n = 2 ** (4 - 1)
    am = jnp.maximum(jnp.abs(g).max(axis=0), 1e-8)
    ws = (n - 1) / am
    base = ws[None, :] * g
    fl = jnp.floor(base)

    def recon(q):
        d = q / ws[None, :] - g
        return float(jnp.sum(d * (gram @ d)))

    e_ada = recon(jnp.clip(fl + h, -n, n - 1))
    e_rtn = recon(jnp.clip(jnp.round(base), -n, n - 1))
    assert e_ada <= e_rtn * 1.0001, (e_ada, e_rtn)
    assert e_ada < e_rtn * 0.9, f"no real gain: {e_ada} vs {e_rtn}"


def test_fold_round_offset_nearest_equivalence():
    """Offsets that encode round-to-nearest reproduce the default fold bit
    for bit (same integers, same scales)."""
    key = jax.random.PRNGKey(5)
    kernel = jax.random.normal(key, (3, 3, 128, 128)) * 0.2
    act_scale = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (128,))) + 0.5
    n = 2 ** (4 - 1)
    g = kernel / act_scale.reshape(1, 1, 128, 1)
    am = jnp.maximum(jnp.abs(g).max(axis=(0, 1, 2)), 1e-8)
    ws = (n - 1) / am
    base = ws * g
    offs = jnp.round(base) - jnp.floor(base)  # exactly replicates jnp.round

    gq0, ws0, wzp0, gh0 = fold_weights_int8(kernel, act_scale, 4, symmetric=True)
    gq1, ws1, wzp1, gh1 = fold_weights_int8(
        kernel, act_scale, 4, symmetric=True, round_offset=offs
    )
    np.testing.assert_array_equal(np.asarray(gq0), np.asarray(gq1))
    np.testing.assert_allclose(np.asarray(gh0), np.asarray(gh1), rtol=0, atol=0)


def test_collect_conv_stats_shapes_and_psd():
    cfg, params, qunet, qstates, xs, seq = _setup()
    name = "down.0.block.0.conv1"
    stats = collect_conv_stats(params, cfg, xs, seq, max_steps=2, names=[name])
    st = stats[name]
    K = 9 * 128
    assert st.gram.shape == (K, K)
    assert st.mu.shape == (K,)
    # two steps x batch 2 x 8x8 pixels
    assert float(st.count) == 2 * 2 * 8 * 8
    g = np.asarray(st.gram)
    np.testing.assert_allclose(g, g.T, rtol=1e-5, atol=1e-4)
    ev = np.linalg.eigvalsh(g)
    assert ev.min() > -1e-2 * max(1.0, ev.max())


def _eps_err(model_fn, params, cfg, x, t):
    ref = unet_apply(params, cfg, x, t)
    got = model_fn(x, t, jnp.asarray(0))
    return float(jnp.mean(jnp.square(got - ref)) / jnp.mean(jnp.square(ref)))


def test_weight_extras_improve_w4_serving():
    """End to end: AdaRound + bias correction must beat the RTN fold on
    teacher-forced eps error at W4A8 (the round-3 north-star lever)."""
    cfg, params, qunet, qstates, xs, seq = _setup(w_bit=4, a_bit=8)
    extras = compute_weight_extras(
        qunet, params, qstates, xs, seq, iters=300, max_steps=2
    )
    # every eligible 128-channel conv got offsets + means
    assert "down.0.block.0.conv1" in extras
    ex = extras["down.0.block.0.conv1"]
    assert ex.round_offset is not None and ex.round_offset.shape == (3, 3, 128, 128)
    assert ex.mu is not None and ex.mu.shape == (9 * 128,)

    rt0 = prepare_serving_runtime(qunet, params, qstates)
    rt1 = prepare_serving_runtime(qunet, params, qstates, weight_extras=extras)
    x, t = xs[0], jnp.full((2,), 5.0)
    e0 = _eps_err(serving_model_fn(qunet, rt0, params, qstates, attn_int8=False), params, cfg, x, t)
    e1 = _eps_err(serving_model_fn(qunet, rt1, params, qstates, attn_int8=False), params, cfg, x, t)
    assert np.isfinite(e0) and np.isfinite(e1)
    assert e1 < e0, f"AdaRound+biascorr did not improve: {e1} vs {e0}"


def test_large_k_chunked_collection_matches_joint(monkeypatch):
    """Layers over GRAM_K_CAP ride extra memory-budgeted collection passes
    (VERDICT r3 item 4) and must land the SAME rounding decisions as joint
    collection.  GRAM_K_CAP is shrunk so every 3x3 conv (K=1152) takes the
    large-K path, with chunk_bytes sized to force multiple passes."""
    import attentiondm_tpu.quant.adaround as ar

    cfg, params, qunet, qstates, xs, seq = _setup()
    ref = compute_weight_extras(
        qunet, params, qstates, xs, seq, max_steps=2, method="gptq"
    )
    monkeypatch.setattr(ar, "GRAM_K_CAP", 500)
    got = compute_weight_extras(
        qunet, params, qstates, xs, seq, max_steps=2, method="gptq",
        chunk_bytes=2 * 4 * 1152**2,  # ~2 K=1152 Grams per pass
    )
    assert set(got) == set(ref)
    big = [n for n in ref if ref[n].round_offset is not None
           and ref[n].round_offset.shape[0] == 3]
    assert big, "no 3x3 layers exercised the large-K path"
    for n in big:
        assert got[n].round_offset is not None, n
        np.testing.assert_array_equal(
            np.asarray(got[n].round_offset), np.asarray(ref[n].round_offset), err_msg=n
        )
        np.testing.assert_allclose(
            np.asarray(got[n].mu), np.asarray(ref[n].mu), rtol=1e-5, atol=1e-5
        )


def test_k_max_fallback_warns_and_keeps_mu(monkeypatch, caplog):
    """K > k_max layers fall back to round-to-nearest LOUDLY (runtime
    advisory) but still get the cheap mu for bias correction."""
    import logging

    import attentiondm_tpu.quant.adaround as ar

    cfg, params, qunet, qstates, xs, seq = _setup()
    monkeypatch.setattr(ar, "GRAM_K_CAP", 500)
    with caplog.at_level(logging.WARNING):
        got = compute_weight_extras(
            qunet, params, qstates, xs, seq, max_steps=2, method="gptq",
            k_max=500,
        )
    assert any("exceeds k_max" in r.message for r in caplog.records)
    big = [n for n in got if got[n].mu is not None and got[n].mu.shape[0] == 9 * 128]
    assert big, "3x3 layers should still be present (mu-only)"
    for n in big:
        assert got[n].round_offset is None, n
        assert got[n].mu is not None, n


def test_bias_correction_only_stays_sane():
    """mu-only extras (no offsets) must not degrade the fold materially."""
    cfg, params, qunet, qstates, xs, seq = _setup(w_bit=4, a_bit=8)
    extras = compute_weight_extras(
        qunet, params, qstates, xs, seq, iters=100, max_steps=2,
        adaround_max_wbit=0,  # disable AdaRound: mu-only
    )
    assert all(e.round_offset is None for e in extras.values())
    rt0 = prepare_serving_runtime(qunet, params, qstates)
    rt1 = prepare_serving_runtime(qunet, params, qstates, weight_extras=extras)
    x, t = xs[0], jnp.full((2,), 5.0)
    e0 = _eps_err(serving_model_fn(qunet, rt0, params, qstates, attn_int8=False), params, cfg, x, t)
    e1 = _eps_err(serving_model_fn(qunet, rt1, params, qstates, attn_int8=False), params, cfg, x, t)
    assert e1 < e0 * 1.1, (e1, e0)
