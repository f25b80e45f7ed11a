"""Teacher-matched stage-2 calibration (quant/calibrate.calibrate_teacher_matched).

The done-criterion from VERDICT r2 item 2: stage 2 must STRICTLY improve on
stage 1 under the protocol's own metric (teacher-forced relative eps error).
"""
import jax
import jax.numpy as jnp
import numpy as np

from attentiondm_tpu.models import UNetConfig, unet_init, unet_apply
from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges
from attentiondm_tpu.quant.calibrate import calibrate_teacher_matched
import pytest

# multi-minute integration file (r5 fast lane: pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _setup(w_bit=6, a_bit=6, ch=64, res=8, steps=3):
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


def _mean_rel_eps(qunet, qparams, qstates, params, cfg, xs, seq):
    t_rev = np.asarray(list(seq))[::-1].astype(np.float32)
    errs = []
    for s in range(xs.shape[0]):
        t = jnp.full((xs.shape[1],), t_rev[s], jnp.float32)
        ref = unet_apply(params, cfg, xs[s], t)
        got = qunet.apply(qparams, qstates, xs[s], t, s, mode="infer")
        errs.append(float(jnp.mean(jnp.square(got - ref)) / jnp.mean(jnp.square(ref))))
    return float(np.mean(errs))


def test_teacher_matched_improves_eps_error():
    cfg, params, qunet, qstates, xs, seq = _setup()
    qparams, _ = qunet.prepare_params(params)

    t_rev = np.asarray(list(seq))[::-1].astype(np.float32)
    eps_ref = jnp.stack(
        [unet_apply(params, cfg, xs[s], jnp.full((2,), t_rev[s])) for s in range(len(seq))]
    )

    e_before = _mean_rel_eps(qunet, qparams, qstates, params, cfg, xs, seq)
    qstates2, losses = calibrate_teacher_matched(
        qunet, qparams, qstates, xs, eps_ref, seq, lr=0.02, epochs=6
    )
    e_after = _mean_rel_eps(qunet, qparams, qstates2, params, cfg, xs, seq)
    assert np.isfinite(e_after)
    assert e_after < e_before, (e_after, e_before)
    assert len(losses) == 6 * len(seq)


def test_teacher_matched_attention_focus_touches_only_attention():
    cfg, params, qunet, qstates, xs, seq = _setup()
    qparams, _ = qunet.prepare_params(params)
    t_rev = np.asarray(list(seq))[::-1].astype(np.float32)
    eps_ref = jnp.stack(
        [unet_apply(params, cfg, xs[s], jnp.full((2,), t_rev[s])) for s in range(len(seq))]
    )
    qstates2, _ = calibrate_teacher_matched(
        qunet, qparams, qstates, xs, eps_ref, seq, lr=0.02, epochs=2,
        attention_focus=True,
    )
    for name in qstates:
        is_attn = ".attn" in name or name.startswith("mid.attn")
        same = np.allclose(
            np.asarray(qstates[name].group_ranges),
            np.asarray(qstates2[name].group_ranges),
        )
        if not is_attn:
            assert same, f"non-attention layer {name} changed"
    changed = any(
        not np.allclose(
            np.asarray(qstates[n].group_ranges), np.asarray(qstates2[n].group_ranges)
        )
        for n in qstates
        if ".attn" in n or n.startswith("mid.attn")
    )
    assert changed, "attention ranges did not move"
