"""Rank-1 step-factorized activation scales -> step-SHARED int8 folds.

The shared fold (quant/rank1.py + _fold_all_steps rank1 branch) must
(a) store one int8 weight tensor for the whole schedule (gq [1, K, Np]),
(b) stay numerically close to the exact per-step fold at 8-bit activations,
(c) be tracked by the rank1 surrogate so refinement transfers 1:1,
(d) reject step_chunk (whole-schedule by construction).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentiondm_tpu.diffusion import DiffusionSchedule
from attentiondm_tpu.models import UNetConfig, unet_apply, unet_init
from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges, compute_weight_extras
from attentiondm_tpu.quant.calibrate import refine_weight_extras, serving_surrogate_apply
from attentiondm_tpu.quant.int8_serving import (
    prepare_serving_runtime,
    serving_ddim_sampler,
    serving_model_fn,
)
from attentiondm_tpu.quant.rank1 import rank1_factors, rank1_scale_zp

# multi-minute integration file (r5 fast lane: pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _setup(w_bit=4, a_bit=8, steps=3):
    cfg = UNetConfig(
        ch=128, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(8,),
        resolution=8, dropout=0.0,
    )
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, w_bit, a_bitwidth=a_bit)
    qstates = qunet.init_state(steps)
    xs = jax.random.normal(jax.random.PRNGKey(1), (steps, 2, 8, 8, 3))
    seq = list(np.linspace(0, 900, steps).astype(int))
    qstates = calibrate_ranges(qunet, params, qstates, xs, seq, first=True)
    return cfg, params, qunet, qstates, xs, seq


def test_rank1_factorization_reconstructs_scales():
    """On state whose scales are exactly rank-1, the factorization is exact
    and the quant windows recover the calibrated ranges."""
    cfg, params, qunet, qstates, xs, seq = _setup()
    st = qstates["down.0.block.0.conv1"]
    u, m = rank1_factors(st, 8)
    S, C = st.act_min.shape
    assert u.shape == (C,) and m.shape == (S,)
    scale, zp = rank1_scale_zp(st, 8, u, m)
    assert scale.shape == (S, C) and zp.shape == (S, C)
    # normalization: mean(log m) == 0, so a GLOBAL range doubling (scale
    # halving) lands entirely in u; m is invariant
    st2 = dataclasses.replace(st, group_ranges=st.group_ranges * 2.0)
    u2, m2 = rank1_factors(st2, 8)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u) / 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=1e-5)
    # a PER-STEP rescaling is absorbed by m (u invariant): scale step 0's
    # ranges by e
    gr3 = np.asarray(st.group_ranges).copy()
    gr3[0] *= float(np.e)
    st3 = dataclasses.replace(st, group_ranges=jnp.asarray(gr3))
    u3, m3 = rank1_factors(st3, 8)
    S = st.alpha_logits.shape[0]
    # mean(log m) renormalizes: step 0 drops by e^(1-1/S), others rise e^(1/S)
    np.testing.assert_allclose(
        np.asarray(m3[0] / m[0]), np.exp(-1.0 + 1.0 / S), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m3[1] / m[1]), np.exp(1.0 / S), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(u3), np.asarray(u) * np.exp(-1.0 / S), rtol=1e-5
    )


def test_rank1_shared_fold_structure_and_accuracy():
    cfg, params, qunet, qstates, xs, seq = _setup()
    rt_full = prepare_serving_runtime(qunet, params, qstates)
    rt_r1 = prepare_serving_runtime(qunet, params, qstates, rank1=True)
    S = len(seq)
    for name, lay in rt_r1.items():
        assert lay.gq.shape[0] == 1, (name, lay.gq.shape)
        assert rt_full[name].gq.shape[0] == S
        assert lay.inv_ws.shape[0] == S and lay.zcbias.shape[0] == S
        assert lay.act_scale.shape[0] == S

    x, t = xs[0], jnp.full((2,), 5.0)
    want = serving_model_fn(qunet, rt_full, params, qstates, attn_int8=False)(
        x, t, jnp.asarray(0)
    )
    got = serving_model_fn(qunet, rt_r1, params, qstates, attn_int8=False)(
        x, t, jnp.asarray(0)
    )
    assert bool(jnp.isfinite(got).all())
    # 8-bit activations: the rank-1 window misfit is a sub-LSB perturbation
    rel = float(jnp.abs(got - want).mean() / (jnp.abs(want).mean() + 1e-9))
    assert rel < 0.05, rel


def test_rank1_surrogate_tracks_shared_serving():
    cfg, params, qunet, qstates, xs, seq = _setup()
    extras = compute_weight_extras(
        qunet, params, qstates, xs, seq, iters=200, max_steps=2, rank1=True
    )
    rt = prepare_serving_runtime(qunet, params, qstates, weight_extras=extras, rank1=True)
    t_rev = np.asarray(list(seq))[::-1].astype(np.float32)
    for i in range(len(seq)):
        t_vec = jnp.full((2,), t_rev[i])
        srv = serving_model_fn(qunet, rt, params, qstates, attn_int8=False)(
            xs[i], t_vec, jnp.asarray(i)
        )
        sur = serving_surrogate_apply(
            qunet, params, qstates, extras, xs[i], t_vec, jnp.asarray(i), rank1=True
        )
        rel = float(jnp.abs(sur - srv).mean() / (jnp.abs(srv).mean() + 1e-9))
        assert rel < 0.02, (i, rel)


def test_rank1_refine_deploys_per_step():
    """Per-step fold refinement through the rank1 surrogate must land in the
    shared-fold runtime (per-step inv_ws/zcbias around the SAME gq) and keep
    the surrogate tracking the deployed forward."""
    cfg, params, qunet, qstates, xs, seq = _setup()
    extras = compute_weight_extras(
        qunet, params, qstates, xs, seq, iters=100, max_steps=2, rank1=True
    )
    t_rev = np.asarray(list(seq))[::-1].astype(np.float32)
    eps_ref = jnp.stack(
        [unet_apply(params, cfg, xs[i], jnp.full((2,), t_rev[i])) for i in range(len(seq))]
    )
    extras2, traces = refine_weight_extras(
        qunet, params, qstates, extras, xs, eps_ref, seq,
        lr=5e-3, per_step=True, inner=6, chunk=3, rank1=True,
    )
    assert np.all(np.isfinite(np.asarray(traces)))
    rt1 = prepare_serving_runtime(qunet, params, qstates, weight_extras=extras, rank1=True)
    rt2 = prepare_serving_runtime(qunet, params, qstates, weight_extras=extras2, rank1=True)
    name = next(iter(rt2))
    # refinement only moves the per-step dequant constants; gq is untouched
    np.testing.assert_array_equal(np.asarray(rt1[name].gq), np.asarray(rt2[name].gq))
    for i in range(len(seq)):
        t_vec = jnp.full((2,), t_rev[i])
        srv = serving_model_fn(qunet, rt2, params, qstates, attn_int8=False)(
            xs[i], t_vec, jnp.asarray(i)
        )
        sur = serving_surrogate_apply(
            qunet, params, qstates, extras2, xs[i], t_vec, jnp.asarray(i), rank1=True
        )
        rel = float(jnp.abs(sur - srv).mean() / (jnp.abs(srv).mean() + 1e-9))
        # 0.03, not 0.02: the bound guards surrogate TRACKING (vs ~0.2+ when
        # the fold diverges), and 0.02 flaked once from kernel-codegen
        # variation (XLA CPU AOT compile cache loaded across machine features)
        assert rel < 0.03, (i, rel)


def test_rank1_sampler_runs_and_rejects_step_chunk():
    cfg, params, qunet, qstates, xs, seq = _setup()
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    out = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas, rank1=True)(x)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())
    # close to the per-step fold's trajectory
    ref = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas)(x)
    rel = float(jnp.abs(out - ref).mean() / (jnp.abs(ref).mean() + 1e-9))
    assert rel < 0.1, rel
    with pytest.raises(ValueError):
        serving_ddim_sampler(
            qunet, params, qstates, seq, sched.betas, rank1=True, step_chunk=2
        )
    with pytest.raises(ValueError):
        prepare_serving_runtime(qunet, params, qstates, rank1=True, steps=slice(0, 2))


def test_rank1_packs_with_int4():
    """rank1 + pack_int4 compose: shared gq stored as nibbles."""
    cfg, params, qunet, qstates, xs, seq = _setup()
    rt = prepare_serving_runtime(qunet, params, qstates, rank1=True, pack_int4=True)
    lay = next(iter(rt.values()))
    assert lay.gq.dtype == jnp.uint8 and lay.gq.shape[0] == 1
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    a = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas, rank1=True)(x)
    b = serving_ddim_sampler(
        qunet, params, qstates, seq, sched.betas, rank1=True, pack_int4=True
    )(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
