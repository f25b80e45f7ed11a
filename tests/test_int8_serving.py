"""Fused int8 serving path vs the round-1 interception path (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentiondm_tpu.models import UNetConfig, unet_init
from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges
from attentiondm_tpu.quant.int8_runtime import int8_model_fn, prepare_int8_runtime
from attentiondm_tpu.quant.int8_serving import (
    prepare_serving_runtime,
    serving_ddim_sampler,
    serving_model_fn,
)

# multi-minute integration file (r5 fast lane: pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _setup(ch=128, attn=(8,), res=8, steps=2):
    """Tiny UNet with 128-channel convs so the fused resblock branch runs."""
    cfg = UNetConfig(
        ch=ch, ch_mult=(1,), num_res_blocks=1, attn_resolutions=attn,
        resolution=res, dropout=0.0,
    )
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, 8)
    qstates = qunet.init_state(steps)
    xs = jax.random.normal(jax.random.PRNGKey(1), (steps, 2, res, res, 3))
    seq = list(np.linspace(0, 900, steps).astype(int))
    qstates = calibrate_ranges(qunet, params, qstates, xs, seq, first=True)
    return cfg, params, qunet, qstates, xs, seq


def test_serving_matches_interception_path():
    cfg, params, qunet, qstates, xs, _ = _setup()
    runtime = prepare_serving_runtime(qunet, params, qstates)
    # the 128-channel resblock convs must be covered (fused branch active)
    assert "down.0.block.0.conv1" in runtime
    assert "mid.attn_1.q" in runtime

    x = xs[0]
    t = jnp.full((2,), 5.0)
    want = int8_model_fn(qunet, prepare_int8_runtime(qunet, params, qstates), params, qstates)(
        x, t, jnp.asarray(0)
    )
    # attn_int8=False: attention core f32 like the interception path
    got = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False)(x, t, jnp.asarray(0))
    assert got.shape == want.shape
    # same weight fold + same activation grid; only GroupNorm float-order
    # details and rounding ties differ between the fused and unfused chains
    rel = float(jnp.abs(got - want).mean() / (jnp.abs(want).mean() + 1e-9))
    assert rel < 0.02, rel
    assert bool(jnp.isfinite(got).all())


def test_serving_bf16_residual_close_to_f32():
    cfg, params, qunet, qstates, xs, _ = _setup()
    runtime = prepare_serving_runtime(qunet, params, qstates)
    x = xs[0]
    t = jnp.full((2,), 5.0)
    f32 = serving_model_fn(qunet, runtime, params, qstates)(x, t, jnp.asarray(0))
    bf16 = serving_model_fn(qunet, runtime, params, qstates, residual_dtype=jnp.bfloat16)(
        x, t, jnp.asarray(0)
    )
    rel = float(jnp.abs(bf16 - f32).mean() / (jnp.abs(f32).mean() + 1e-9))
    assert rel < 0.05, rel


def test_serving_int8_upsample_matches_interception():
    """Two-level UNet: the up-path int8-domain nearest upsample (quantize at
    low res, duplicate int8 entries) must stay equivalent to the interception
    path, which resizes f32 then quantizes — nearest resize commutes exactly
    with per-channel quantization."""
    cfg = UNetConfig(
        ch=128, ch_mult=(1, 1), num_res_blocks=1, attn_resolutions=(),
        resolution=8, dropout=0.0,
    )
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, 8)
    steps = 2
    qstates = qunet.init_state(steps)
    xs = jax.random.normal(jax.random.PRNGKey(1), (steps, 2, 8, 8, 3))
    seq = list(np.linspace(0, 900, steps).astype(int))
    qstates = calibrate_ranges(qunet, params, qstates, xs, seq, first=True)
    runtime = prepare_serving_runtime(qunet, params, qstates)
    assert "up.1.upsample.conv" in runtime  # the int8 upsample branch engages

    x, t = xs[0], jnp.full((2,), 5.0)
    want = int8_model_fn(qunet, prepare_int8_runtime(qunet, params, qstates), params, qstates)(
        x, t, jnp.asarray(0)
    )
    got = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False)(x, t, jnp.asarray(0))
    rel = float(jnp.abs(got - want).mean() / (jnp.abs(want).mean() + 1e-9))
    assert rel < 0.02, rel

    # the commutation itself, exactly: q(resize(h)) == resize(q(h))
    from attentiondm_tpu.quant.int8_serving import _quant_i8

    h = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 128))
    scale = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (128,))) * 10 + 1
    zp = jnp.round(jax.random.normal(jax.random.PRNGKey(4), (128,)) * 5)
    up_f32 = jax.image.resize(h, (2, 8, 8, 128), method="nearest")
    a = _quant_i8(up_f32, scale, zp, 8)
    b = jnp.repeat(jnp.repeat(_quant_i8(h, scale, zp, 8), 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serving_uncovered_channels_fall_back():
    """ch=64 (not 128-aligned) routes through the unfused per-conv dispatch
    and still matches the interception path."""
    cfg, params, qunet, qstates, xs, _ = _setup(ch=64, attn=())
    runtime = prepare_serving_runtime(qunet, params, qstates)
    x = xs[0]
    t = jnp.full((2,), 5.0)
    want = int8_model_fn(qunet, prepare_int8_runtime(qunet, params, qstates), params, qstates)(
        x, t, jnp.asarray(1)
    )
    got = serving_model_fn(qunet, runtime, params, qstates)(x, t, jnp.asarray(1))
    rel = float(jnp.abs(got - want).mean() / (jnp.abs(want).mean() + 1e-9))
    assert rel < 0.02, rel


def test_chunked_sampler_equals_unchunked():
    """step_chunk bounds folded-weight HBM; outputs must be identical."""
    from attentiondm_tpu.diffusion import DiffusionSchedule

    cfg, params, qunet, qstates, xs, seq = _setup(steps=4)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = [0, 300, 600, 900]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))

    full = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas)
    chunked = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas, step_chunk=3)
    np.testing.assert_allclose(
        np.asarray(full(x)), np.asarray(chunked(x)), rtol=1e-5, atol=1e-6
    )


def test_serving_ddpm_sampler_matches_generic_scan():
    """update="ddpm" must equal ddpm_sample() driven by serving_model_fn with
    the same key (identical split order per step), and chunked must equal
    unchunked under the always-noised update too."""
    from attentiondm_tpu.diffusion import DiffusionSchedule
    from attentiondm_tpu.diffusion.sampling import ddpm_sample

    cfg, params, qunet, qstates, xs, seq = _setup(steps=4)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = [0, 300, 600, 900]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    key = jax.random.PRNGKey(7)

    got = serving_ddim_sampler(
        qunet, params, qstates, seq, sched.betas, update="ddpm", attn_int8=False
    )(x, key)
    runtime = prepare_serving_runtime(qunet, params, qstates)
    fn = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False)
    want = jax.jit(lambda x, k: ddpm_sample(fn, x, seq, sched.betas, key=k))(x, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
    assert bool(jnp.isfinite(got).all())

    chunked = serving_ddim_sampler(
        qunet, params, qstates, seq, sched.betas, update="ddpm", attn_int8=False,
        step_chunk=3,
    )(x, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(chunked), rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="update"):
        serving_ddim_sampler(qunet, params, qstates, seq, sched.betas, update="euler")


def test_serving_int8_attention_close_to_f32_core():
    """Dynamic int8 QK^T + bf16 PV vs the f32 attention core."""
    cfg, params, qunet, qstates, xs, _ = _setup()
    runtime = prepare_serving_runtime(qunet, params, qstates)
    x = xs[0]
    t = jnp.full((2,), 5.0)
    f32core = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False)(
        x, t, jnp.asarray(0)
    )
    i8core = serving_model_fn(qunet, runtime, params, qstates, attn_int8=True)(
        x, t, jnp.asarray(0)
    )
    rel = float(jnp.abs(i8core - f32core).mean() / (jnp.abs(f32core).mean() + 1e-9))
    assert rel < 0.02, rel


def test_fused_int8_attention_kernel_matches_reference():
    """Pallas attention kernel vs its jnp oracle at an MXU-aligned shape."""
    from attentiondm_tpu.ops.int8_attention import (
        fused_int8_attention,
        fused_int8_attention_reference,
    )

    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 8)
    B, L, C = 3, 256, 128
    dots = [jax.random.randint(k, (B, L, C), -(2**15), 2**15, jnp.int32) for k in ks[:3]]
    epis = [
        (jnp.exp(0.1 * jax.random.normal(k, (C,))) * 1e-4, 0.1 * jax.random.normal(k2, (C,)))
        for k, k2 in zip(ks[3:6], ks[5:8])
    ]
    s = jnp.full((C,), 20.0)
    z = jnp.zeros((C,))
    got = fused_int8_attention(
        dots[0], dots[1], dots[2], *epis, s, z, 8, scale=C**-0.5, interpret=True
    )
    want = fused_int8_attention_reference(
        dots[0], dots[1], dots[2], *epis, s, z, 8, scale=C**-0.5
    )
    assert got.dtype == jnp.int8 and got.shape == want.shape
    frac = float(jnp.mean((got != want).astype(jnp.float32)))
    assert frac < 2e-3, frac
    assert int(jnp.abs(got.astype(jnp.int32) - want.astype(jnp.int32)).max()) <= 1


def test_fused_int8_attention_exact_when_prequantized():
    """With identity epilogues and integer-valued accumulators in [-127,127],
    the dynamic quantization is exact and logits match f32 bit-for-bit."""
    from attentiondm_tpu.ops.int8_attention import fused_int8_attention_reference

    key = jax.random.PRNGKey(8)
    B, L, C = 2, 64, 128
    dq = jax.random.randint(key, (B, L, C), -127, 128, jnp.int32)
    dk = jax.random.randint(jax.random.fold_in(key, 1), (B, L, C), -127, 128, jnp.int32)
    dv = jax.random.randint(jax.random.fold_in(key, 2), (B, L, C), -4, 5, jnp.int32)
    ident = (jnp.ones((C,)), jnp.zeros((C,)))
    # force absmax=127 so scale==1 exactly
    dq = dq.at[:, 0, 0].set(127)
    dk = dk.at[:, 0, 0].set(127)
    got = fused_int8_attention_reference(dq, dk, dv, ident, ident, ident,
                                         jnp.full((C,), 4.0), jnp.zeros((C,)), 8,
                                         scale=C**-0.5)
    # f32 oracle with the same bf16 PV step
    q = dq.astype(jnp.float32); k = dk.astype(jnp.float32); v = dv.astype(jnp.float32)
    lf = jnp.einsum("blc,bmc->blm", q, k) * (C**-0.5)
    p = jax.nn.softmax(lf, axis=-1)
    out = jax.lax.dot_general(p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                              (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    want = jnp.clip(jnp.round(4.0 * out), -128, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_serving_sampler_finite_with_eta():
    from attentiondm_tpu.diffusion import DiffusionSchedule

    cfg, params, qunet, qstates, xs, seq = _setup(steps=3)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = [0, 400, 800]
    sample = serving_ddim_sampler(
        qunet, params, qstates, seq, sched.betas, eta=1.0, step_chunk=2
    )
    out = sample(jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 3)),
                 key=jax.random.PRNGKey(5))
    assert bool(jnp.isfinite(out).all())


def test_static_int8_attention_matches_its_reference():
    from attentiondm_tpu.ops.int8_attention import (
        fused_int8_attention_static,
        fused_int8_attention_static_reference,
    )

    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 3)
    B, L, C = 2, 128, 128
    q8, k8, v8 = (jax.random.randint(k, (B, L, C), -127, 128, jnp.int8) for k in ks)
    sq, sk, sv = jnp.asarray(0.03), jnp.asarray(0.05), jnp.asarray(0.02)
    s = jnp.full((C,), 15.0)
    z = jnp.zeros((C,))
    got = fused_int8_attention_static(
        q8, k8, v8, sq, sk, sv, s, z, 8, scale=C**-0.5, interpret=True
    )
    want = fused_int8_attention_static_reference(q8, k8, v8, sq, sk, sv, s, z, 8, scale=C**-0.5)
    frac = float(jnp.mean((got != want).astype(jnp.float32)))
    assert frac < 2e-3, frac
    assert int(jnp.abs(got.astype(jnp.int32) - want.astype(jnp.int32)).max()) <= 1


def test_serving_static_attn_ranges_close_to_f32_core(monkeypatch):
    """Calibrated static int8 QK^T attention tracks the f32 attention core.

    The whole-block kernel now composes with --attn_int8 (dynamic in-VMEM
    core), so to exercise the STATIC-scale dispatch we force the whole-block
    kernel ineligible by zeroing its VMEM budget."""
    import attentiondm_tpu.ops.int8_attention as i8attn

    cfg, params, qunet, qstates, xs, seq = _setup()
    qstates2 = qunet.init_state(2)
    res = calibrate_ranges(qunet, params, qstates2, xs, seq, first=True, return_attn_ranges=True)
    qstates2, attn_ranges = res
    assert any(n.endswith(".q") for n in attn_ranges), attn_ranges.keys()
    assert all(a.shape == (2,) for a in attn_ranges.values())
    runtime = prepare_serving_runtime(qunet, params, qstates2)
    x = xs[0]
    t = jnp.full((2,), 5.0)
    f32core = serving_model_fn(qunet, runtime, params, qstates2, attn_int8=False)(
        x, t, jnp.asarray(0)
    )
    monkeypatch.setattr(i8attn, "FUSED_ATTN_VMEM_BUDGET", 0)
    static = serving_model_fn(
        qunet, runtime, params, qstates2, attn_int8=True, attn_ranges=attn_ranges
    )(x, t, jnp.asarray(0))
    rel = float(jnp.abs(static - f32core).mean() / (jnp.abs(f32core).mean() + 1e-9))
    # static scales come from the calibration batch, so slight clipping on a
    # different eval batch is expected — looser bound than the dynamic core
    assert rel < 0.03, rel


def test_serving_rejects_asymmetric_fold():
    """ServingLayer has no wzp and the epilogue no rowsum term; an asymmetric
    fold must be refused loudly, not silently produce garbage."""
    import pytest

    from attentiondm_tpu.quant.int8_serving import prepare_serving_runtime

    cfg = UNetConfig(ch=64, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(),
                     resolution=8, dropout=0.0)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, 8)
    qstates = qunet.init_state(1)
    with pytest.raises(NotImplementedError):
        prepare_serving_runtime(qunet, params, qstates, symmetric=False)


def test_serving_enhanced_attn_variant():
    """The serving engine supports attn_variant='enhanced': int8 projections
    through _conv_any, f32 core, gamma residual — must track the fake-quant
    infer path like the ddim variant does."""
    import dataclasses

    cfg = UNetConfig(
        ch=128, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(8,),
        resolution=8, dropout=0.0, attn_variant="enhanced",
    )
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, 8)
    steps = 2
    qstates = qunet.init_state(steps)
    xs = jax.random.normal(jax.random.PRNGKey(1), (steps, 2, 8, 8, 3))
    seq = [0, 500]
    qstates = calibrate_ranges(qunet, params, qstates, xs, seq, first=True)
    runtime = prepare_serving_runtime(qunet, params, qstates)
    assert "mid.attn_1.query_conv" in runtime  # enhanced projections folded

    x = xs[0]
    t = jnp.full((2,), 5.0)
    qparams, _ = qunet.prepare_params(params)
    want = qunet.apply(qparams, qstates, x, t, 0, mode="infer")
    got = serving_model_fn(qunet, runtime, params, qstates)(x, t, jnp.asarray(0))
    assert got.shape == want.shape
    rel = float(jnp.abs(got - want).mean() / (jnp.abs(want).mean() + 1e-9))
    assert rel < 0.1, rel  # weight-fold quantization differs, like int8-vs-infer
    assert bool(jnp.isfinite(got).all())


def test_exit_residual_stats_kernel_matches_manual():
    """ops/fused_gn.epilogue_residual_gn_stats: residual' and GN sums must
    match the unfused epilogue + jnp statistics (boundary fusion, round 3)."""
    from attentiondm_tpu.ops.fused_gn import (
        epilogue_residual_gn_stats,
        gn_finalize_sums,
    )

    B, H, W, N = 2, 8, 8, 128
    key = jax.random.PRNGKey(3)
    dot = jax.random.randint(key, (B, H, W, N), -(2**18), 2**18, dtype=jnp.int32)
    inv_ws = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (N,))) * 1e-4 + 1e-5
    zcbias = jax.random.normal(jax.random.fold_in(key, 2), (N,))
    res = jax.random.normal(jax.random.fold_in(key, 3), (B, H, W, N))

    out, sums = epilogue_residual_gn_stats(dot, inv_ws, zcbias, res, interpret=True)
    want = res + (dot.astype(jnp.float32) * inv_ws + zcbias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-4)

    # sums reproduce GroupNorm statistics of residual'
    mean, rstd = gn_finalize_sums(sums, H * W, N // 32)
    wg = np.asarray(want, np.float64).reshape(B, H * W, 32, N // 32)
    mean_ref = wg.mean(axis=(1, 3))
    var_ref = wg.var(axis=(1, 3))
    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(rstd), 1.0 / np.sqrt(var_ref + 1e-6), rtol=1e-3, atol=1e-3
    )


def test_serving_boundary_fusion_matches_interception():
    """A no-attention 2-block config engages the exit->entry boundary fusion
    (want_exit_stats=True inside the level); the serving forward must stay
    equivalent to the interception path."""
    cfg = UNetConfig(
        ch=128, ch_mult=(1,), num_res_blocks=2, attn_resolutions=(),
        resolution=8, dropout=0.0,
    )
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, 8)
    qstates = qunet.init_state(2)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 8, 8, 3))
    seq = [0, 500]
    from attentiondm_tpu.quant import calibrate_ranges as _cal

    qstates = _cal(qunet, params, qstates, xs, seq, first=True)
    runtime = prepare_serving_runtime(qunet, params, qstates)
    x, t = xs[0], jnp.full((2,), 5.0)
    want = int8_model_fn(qunet, prepare_int8_runtime(qunet, params, qstates), params, qstates)(
        x, t, jnp.asarray(0)
    )
    # dot_bf16=False: this test isolates the boundary-fusion kernel against
    # the interception oracle at a 2% tolerance; the (default-on) bf16
    # epilogue adds its own ~1 LSB rounding which belongs to its own test
    got = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False,
                           boundary_fusion=True, dot_bf16=False)(x, t, jnp.asarray(0))
    rel = float(jnp.abs(got - want).mean() / (jnp.abs(want).mean() + 1e-9))
    assert rel < 0.02, rel
    # default-off path (boundary fusion is opt-in: measured neutral on chip)
    got_off = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False,
                               dot_bf16=False)(x, t, jnp.asarray(0))
    rel_off = float(jnp.abs(got_off - want).mean() / (jnp.abs(want).mean() + 1e-9))
    assert rel_off < 0.02, rel_off


def test_chunked_sampler_slices_per_step_extras():
    """step_chunk must apply chunk c's out_mult/bias_delta rows, not rows
    0..chunk-1 (round-3 review finding: gr/al were sliced, extras were not).
    Per-step values DIFFER across steps so the bug cannot cancel."""
    from attentiondm_tpu.diffusion import DiffusionSchedule
    from attentiondm_tpu.quant.adaround import WeightExtras

    cfg, params, qunet, qstates, xs, seq = _setup(steps=4)
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = [0, 300, 600, 900]
    S = len(seq)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))

    names = list(prepare_serving_runtime(qunet, params, qstates).keys())
    extras = {}
    k = jax.random.PRNGKey(9)
    for n in names:
        node = params
        for p in n.split("."):
            node = node[int(p)] if isinstance(node, list) else node[p]
        co = node["kernel"].shape[3]
        k, k1, k2 = jax.random.split(k, 3)
        extras[n] = WeightExtras(
            round_offset=None, mu=None, shrink=jnp.ones((co,)),
            out_mult=1.0 + 0.2 * jax.random.normal(k1, (S, co)),
            bias_delta=0.05 * jax.random.normal(k2, (S, co)),
        )

    full = serving_ddim_sampler(
        qunet, params, qstates, seq, sched.betas, weight_extras=extras
    )
    chunked = serving_ddim_sampler(
        qunet, params, qstates, seq, sched.betas, step_chunk=3, weight_extras=extras
    )
    np.testing.assert_allclose(
        np.asarray(full(x)), np.asarray(chunked(x)), rtol=1e-5, atol=1e-6
    )


def test_pack_int4_roundtrip():
    from attentiondm_tpu.quant.int8_serving import pack_int4, unpack_int4

    gq = jax.random.randint(jax.random.PRNGKey(0), (3, 256, 128), -8, 8, jnp.int8)
    packed = pack_int4(gq)
    assert packed.dtype == jnp.uint8 and packed.shape == (3, 128, 128)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(gq))


def test_packed_serving_bit_identical():
    """int4 nibble packing changes no weight value: packed sampling output
    must be BIT-identical to the unpacked per-step fold at w_bit<=4."""
    from attentiondm_tpu.diffusion import DiffusionSchedule
    from attentiondm_tpu.models import UNetConfig, unet_init
    from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges

    cfg = UNetConfig(ch=128, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(8,),
                     resolution=8, dropout=0.0)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, 4, 8)  # W4A8: every eligible layer packs
    qstates = qunet.init_state(3)
    xs = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 8, 8, 3))
    seq = [0, 400, 800]
    qstates = calibrate_ranges(qunet, params, qstates, xs, seq, first=True)
    rt = prepare_serving_runtime(qunet, params, qstates)
    rt_p = prepare_serving_runtime(qunet, params, qstates, pack_int4=True)
    assert all(lay.gq.dtype == jnp.uint8 for lay in rt_p.values())
    assert all(
        rt_p[n].gq.shape[-2] * 2 == rt[n].gq.shape[-2] for n in rt
    )
    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    a = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas)(x)
    b = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas, pack_int4=True)(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dot_bf16_close_to_int32_epilogue():
    """`dot_bf16` folds dequant+bias into the conv's XLA output fusion and
    hands the Pallas epilogues bf16 — numerics must stay within the W4A8
    quantization noise (bf16 rounds the bias-corrected value, rel <= 2^-9,
    i.e. about one 8-bit activation LSB)."""
    cfg, params, qunet, qstates, xs, _ = _setup()
    runtime = prepare_serving_runtime(qunet, params, qstates)
    x = xs[0]
    t = jnp.full((2,), 5.0)
    base = serving_model_fn(
        qunet, runtime, params, qstates, attn_int8=False, dot_bf16=False
    )(x, t, jnp.asarray(0))
    fast = serving_model_fn(
        qunet, runtime, params, qstates, attn_int8=False, dot_bf16=True
    )(x, t, jnp.asarray(0))
    rel = float(jnp.abs(fast - base).mean() / (jnp.abs(base).mean() + 1e-9))
    assert rel < 0.02, rel
    # and through the sampler (boundary-fusion exit-stats kernel included)
    from attentiondm_tpu.diffusion import DiffusionSchedule

    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = [0, 500]
    a = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas,
                             attn_int8=False, dot_bf16=False)(x)
    b = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas,
                             attn_int8=False, dot_bf16=True,
                             boundary_fusion=True)(x)
    rel = float(jnp.abs(a - b).mean() / (jnp.abs(a).mean() + 1e-9))
    assert np.isfinite(rel) and rel < 0.05, rel


def test_conv_pallas_close_to_xla_conv():
    """`conv_pallas` routes the fused resblock 3x3 convs through the
    implicit-im2col Pallas kernel (ops/pallas_conv.py) with the dequant
    epilogue fused to bf16 — it must be taken at an eligible shape, stay at
    bf16-rounding distance from the XLA conv path, and compose with the
    bf16 residual stream through the sampler (its shipping configuration)."""
    from attentiondm_tpu.ops.pallas_conv import conv3_pallas_fits

    cfg, params, qunet, qstates, xs, _ = _setup()
    assert conv3_pallas_fits(2, 8, 8, 128, 128)
    runtime = prepare_serving_runtime(qunet, params, qstates)
    x = xs[0]
    t = jnp.full((2,), 5.0)
    base = serving_model_fn(
        qunet, runtime, params, qstates, attn_int8=False, dot_bf16=True
    )(x, t, jnp.asarray(0))
    fast = serving_model_fn(
        qunet, runtime, params, qstates, attn_int8=False, dot_bf16=True,
        conv_pallas="all",
    )(x, t, jnp.asarray(0))
    rel = float(jnp.abs(fast - base).mean() / (jnp.abs(base).mean() + 1e-9))
    assert np.isfinite(rel) and rel < 0.02, rel

    from attentiondm_tpu.diffusion import DiffusionSchedule

    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = [0, 500]
    a = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas,
                             attn_int8=False,
                             residual_dtype=jnp.bfloat16)(x)
    b = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas,
                             attn_int8=False, conv_pallas="all",
                             residual_dtype=jnp.bfloat16)(x)
    rel = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).mean()
                / (jnp.abs(a.astype(jnp.float32)).mean() + 1e-9))
    assert np.isfinite(rel) and rel < 0.05, rel


def test_entry_pallas_close_to_xla_entry(monkeypatch):
    """`entry_pallas` routes resblock/conv GN entries through the one-pass
    Pallas kernel (ops/fused_gn.gn_act_quant) — numerics must stay at
    rounding-tie distance from the XLA two-pass entry, the kernel must
    actually be TAKEN at a gate-eligible shape, and it must compose with
    dot_bf16 + the bf16 residual stream through the sampler (the
    configuration it would ship in).  ADVICE r3 item 1."""
    import attentiondm_tpu.ops.fused_gn as fgn

    cfg, params, qunet, qstates, xs, _ = _setup()
    # HW=64, C=128 passes the whole-image VMEM gate
    assert fgn.gn_act_quant_fits(64, 128)
    runtime = prepare_serving_runtime(qunet, params, qstates)
    x = xs[0]
    t = jnp.full((2,), 5.0)

    calls = []
    real = fgn.gn_act_quant
    monkeypatch.setattr(fgn, "gn_act_quant", lambda *a, **k: calls.append(1) or real(*a, **k))

    base = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False)(
        x, t, jnp.asarray(0)
    )
    assert not calls
    fast = serving_model_fn(
        qunet, runtime, params, qstates, attn_int8=False, entry_pallas=True,
        residual_dtype=jnp.bfloat16,
    )(x, t, jnp.asarray(0))
    assert calls, "entry_pallas did not reach the Pallas kernel"
    rel = float(jnp.abs(fast - base).mean() / (jnp.abs(base).mean() + 1e-9))
    assert rel < 0.05, rel

    # shipping configuration: entry_pallas + dot_bf16 + bf16 residual, jitted
    # sampler end to end
    from attentiondm_tpu.diffusion import DiffusionSchedule

    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    seq = [0, 500]
    a = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas,
                             attn_int8=False, residual_dtype=jnp.bfloat16)(x)
    b = serving_ddim_sampler(qunet, params, qstates, seq, sched.betas,
                             attn_int8=False, residual_dtype=jnp.bfloat16,
                             entry_pallas=True, dot_bf16=True)(x)
    rel = float(jnp.abs(a - b).mean() / (jnp.abs(a).mean() + 1e-9))
    assert np.isfinite(rel) and rel < 0.05, rel


def test_serving_mp_attention_matches_interception():
    """Stage-3 mixed-precision attention rides the serving engine (VERDICT r3
    item #3): serving with mp_states must (a) actually engage the MP core
    (differ from the plain enhanced core) and (b) match the interception
    (fake-quant) path running the identical MP core + timestep."""
    from attentiondm_tpu.models.unet import unet_apply
    from attentiondm_tpu.quant.attention_mp import (
        init_mp_attention_state,
        update_quant_params,
    )
    from attentiondm_tpu.quant.qunet import make_quant_conv_apply

    cfg = UNetConfig(
        ch=128, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(8,),
        resolution=8, dropout=0.0, attn_variant="enhanced",
    )
    params = unet_init(jax.random.PRNGKey(0), cfg)

    # gamma inits to 0 (reference parity) which zeroes the attention branch —
    # set it nonzero so the core actually contributes to the output
    def _set_gamma(node):
        if isinstance(node, dict):
            return {k: (jnp.ones_like(v) if k == "gamma" else _set_gamma(v))
                    for k, v in node.items()}
        if isinstance(node, list):
            return [_set_gamma(v) for v in node]
        return node

    params = _set_gamma(params)
    qunet = QuantizedUNet.create(cfg, 8)
    steps = 2
    qstates = qunet.init_state(steps)
    xs = jax.random.normal(jax.random.PRNGKey(1), (steps, 2, 8, 8, 3))
    seq = [0, 900]
    qstates = calibrate_ranges(qunet, params, qstates, xs, seq, first=True)
    runtime = prepare_serving_runtime(qunet, params, qstates)
    sites = sorted({n.rsplit(".", 1)[0] for n in runtime if n.endswith("query_conv")})
    assert sites, runtime.keys()

    # base_bits=4 -> effective bits ~5.2: logits ARE quantized (<= 6)
    base_bits = 4
    mp_states = {
        s: update_quant_params(init_mp_attention_state(10), -2.0, 2.0, base_bits)
        for s in sites
    }
    x, t = xs[0], jnp.full((2,), 5.0)

    base = serving_model_fn(qunet, runtime, params, qstates)(x, t, jnp.asarray(0))
    got = serving_model_fn(
        qunet, runtime, params, qstates, mp_states=mp_states, mp_base_bits=base_bits
    )(x, t, jnp.asarray(0))
    # (a) the MP core changed the output (multi-head + quantized logits)
    assert float(jnp.abs(got - base).max()) > 1e-6

    # (b) interception path with the identical MP attn_ctx.  The serving and
    # interception engines already differ by ~2.5% rel at this random-weight
    # setup WITHOUT the MP core (int8 conv vs fake-quant) — so the assertion
    # is relative: composing the MP core must not widen that baseline gap.
    qparams, _ = qunet.prepare_params(params)
    ca = make_quant_conv_apply(qstates, qunet.policy, jnp.asarray(0), mode="infer")
    want = unet_apply(
        qparams, cfg, x, t, conv_apply=ca,
        attn_ctx={"mp_states": mp_states, "base_bits": base_bits,
                  "timestep": jnp.asarray(5, jnp.int32)},
    )
    want0 = unet_apply(qparams, cfg, x, t, conv_apply=ca)
    rel = float(jnp.abs(got - want).mean() / (jnp.abs(want).mean() + 1e-9))
    rel0 = float(jnp.abs(base - want0).mean() / (jnp.abs(want0).mean() + 1e-9))
    assert rel < rel0 * 1.3 + 1e-3, (rel, rel0)

    # and through the jitted sampler end to end
    from attentiondm_tpu.diffusion import DiffusionSchedule

    sched = DiffusionSchedule.create("linear", 1e-4, 0.02, 1000)
    out = serving_ddim_sampler(
        qunet, params, qstates, seq, sched.betas,
        mp_states=mp_states, mp_base_bits=base_bits,
    )(jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 3)))
    assert bool(jnp.isfinite(out).all())


def test_serving_attn_int8_composes_with_whole_block_kernel():
    """--attn_int8 no longer kicks the attention site off the whole-block
    kernel (VERDICT r3 weak #6): at a fits-eligible shape the composed
    kernel (int8_core) runs and stays within quantization noise of both the
    f32-core whole-block pass and the old non-fused int8 dispatch."""
    import attentiondm_tpu.ops.int8_attention as i8attn

    cfg, params, qunet, qstates, xs, _ = _setup()
    runtime = prepare_serving_runtime(qunet, params, qstates)
    x, t = xs[0], jnp.full((2,), 5.0)
    L, C = 64, 128
    assert i8attn.fused_attention_block_fits(L, C)

    f32core = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False)(
        x, t, jnp.asarray(0)
    )
    composed = serving_model_fn(qunet, runtime, params, qstates, attn_int8=True)(
        x, t, jnp.asarray(0)
    )
    rel = float(jnp.abs(composed - f32core).mean() / (jnp.abs(f32core).mean() + 1e-9))
    assert rel < 0.02, rel
