import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attentiondm_tpu.models import UNetConfig, unet_init, unet_apply
from attentiondm_tpu.models.unet import iter_conv_layers
from attentiondm_tpu.quant import (
    MPAttentionState,
    init_mp_attention_state,
    mp_attention,
    effective_bits,
    update_quant_params,
    calibrate_mp_attention,
    make_logit_collector,
    QuantizedUNet,
)

ENH = dict(
    ch=32,
    out_ch=3,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=(8,),
    dropout=0.0,
    in_channels=3,
    resolution=16,
    attn_variant="enhanced",
    attn_heads=8,
)


def test_effective_bits():
    st = init_mp_attention_state(1000)
    # importance 0.5 -> base + 2*sigmoid(0.5) ≈ base + 1.245
    b = effective_bits(st, 4, 100)
    assert float(b) == pytest.approx(4 + 2 / (1 + np.exp(-0.5)), rel=1e-5)
    assert float(effective_bits(st, 6, None)) == 6.0


@pytest.mark.parametrize("head_split", ["aligned", "ref"])
def test_mp_attention_high_bits_matches_plain(head_split):
    """At high effective bits no quantization branch fires -> plain MHA,
    for both the fixed (D13 aligned) and reference-parity head splits."""
    st = init_mp_attention_state(10)
    st.timestep_importance = jnp.full((10,), 10.0)  # bits = 8+2 = 10 > thresholds
    B, L, C = 2, 16, 32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, L, C))
    k = jax.random.normal(k2, (B, C, L))
    v = jax.random.normal(k3, (B, L, C))
    out = mp_attention(q, k, v, st, num_heads=8, base_bits=8, timestep=3,
                       head_split=head_split)

    # plain reference computation
    h = 8
    qh = q.reshape(B, L, h, C // h).transpose(0, 2, 1, 3)
    if head_split == "ref":
        kh = k.reshape(B, C // h, h, L).transpose(0, 2, 3, 1).transpose(0, 1, 3, 2)
    else:
        kh = k.reshape(B, h, C // h, L)
    vh = v.reshape(B, L, h, C // h).transpose(0, 2, 1, 3)
    w = jax.nn.softmax(jnp.einsum("bhld,bhdm->bhlm", qh, kh) * (C ** -0.5), axis=-1)
    expect = jnp.einsum("bhlm,bhmd->bhld", w, vh).transpose(0, 2, 1, 3).reshape(B, L, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_mp_attention_head_split_modes_differ_multihead():
    """D13: with >1 head the aligned and ref splits pair different channel
    slices, so outputs differ; with 1 head they coincide."""
    st = init_mp_attention_state(10)
    st.timestep_importance = jnp.full((10,), 10.0)
    B, L, C = 1, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (B, L, C))
    k = jax.random.normal(ks[1], (B, C, L))
    v = jax.random.normal(ks[2], (B, L, C))
    a = mp_attention(q, k, v, st, num_heads=4, base_bits=8, timestep=0, head_split="aligned")
    r = mp_attention(q, k, v, st, num_heads=4, base_bits=8, timestep=0, head_split="ref")
    assert float(jnp.abs(a - r).max()) > 1e-5
    a1 = mp_attention(q, k, v, st, num_heads=1, base_bits=8, timestep=0, head_split="aligned")
    r1 = mp_attention(q, k, v, st, num_heads=1, base_bits=8, timestep=0, head_split="ref")
    np.testing.assert_allclose(np.asarray(a1), np.asarray(r1), atol=1e-6)


def test_mp_attention_low_bits_quantizes():
    """Low base bits + calibrated scale -> output differs from plain but stays
    a valid attention output (rows of probs still sum to one pre-quant)."""
    st = init_mp_attention_state(10)
    st.timestep_importance = jnp.full((10,), -10.0)  # bits ≈ base
    st = update_quant_params(st, jnp.asarray(-3.0), jnp.asarray(3.0), 4)
    B, L, C = 1, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, L, C))
    k = jax.random.normal(ks[1], (B, C, L))
    v = jax.random.normal(ks[2], (B, L, C))
    out_q = mp_attention(q, k, v, st, num_heads=4, base_bits=4, timestep=0)
    st_hi = init_mp_attention_state(10)
    st_hi.timestep_importance = jnp.full((10,), 10.0)
    out_hi = mp_attention(q, k, v, st_hi, num_heads=4, base_bits=8, timestep=0)
    assert float(jnp.abs(out_q - out_hi).max()) > 1e-4
    assert bool(jnp.isfinite(out_q).all())


def test_update_quant_params_closed_form():
    st = init_mp_attention_state(10)
    st2 = update_quant_params(st, jnp.asarray(-2.0), jnp.asarray(6.0), 8)
    assert float(st2.scale_qk) == pytest.approx(8 / 255)
    assert float(st2.zero_qk) == pytest.approx(2.0 / (8 / 255))
    assert float(st2.scale_probs) == pytest.approx(1 / 255)


def test_enhanced_unet_forward_and_identity_at_init():
    """gamma starts at 0 -> enhanced attention is initially the identity."""
    cfg = UNetConfig(**ENH)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 5.0)
    out = unet_apply(params, cfg, x, t)
    assert out.shape == x.shape

    # identical net with attention zeroed out entirely must match (gamma=0)
    cfg_no_attn = UNetConfig(**{**ENH, "attn_resolutions": ()})
    params2 = unet_init(jax.random.PRNGKey(0), cfg_no_attn)
    # copy shared weights by name where both exist
    def sync(a, b):
        if isinstance(a, dict):
            return {k_: (sync(a[k_], b[k_]) if k_ in b else a[k_]) for k_ in a}
        if isinstance(a, list):
            return [sync(x_, y_) for x_, y_ in zip(a, b)]
        return b
    # run enhanced again with gamma=0 (already) — mid attn still present; the
    # claim is just that the graph runs and is finite
    assert bool(jnp.isfinite(out).all())


def test_enhanced_bit_policy():
    cfg = UNetConfig(**ENH)
    q = QuantizedUNet.create(cfg, 8)
    key_layers = [n for n in q.policy if n.endswith("key_conv")]
    assert key_layers
    for n in key_layers:
        assert q.policy[n].a_bit == 6
    val_layers = [n for n in q.policy if n.endswith("value_conv")]
    for n in val_layers:
        assert q.policy[n].group_num == 4
    # enumerated convs all exist in params
    params = unet_init(jax.random.PRNGKey(0), cfg)
    for name, cin, ksz in iter_conv_layers(cfg):
        node = params
        for p_ in name.split("."):
            node = node[int(p_)] if isinstance(node, list) else node[p_]
        assert node["kernel"].shape[2] == cin, name


def test_stage3_calibration_end_to_end():
    cfg = UNetConfig(**ENH)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    collector = make_logit_collector(params, cfg, x)
    stats = collector(0)
    assert stats  # at least one attention layer captured
    for name, (mn, mx) in stats.items():
        assert float(mn) <= float(mx)

    states = {name: init_mp_attention_state(10) for name in stats}
    new_states = calibrate_mp_attention(collector, states, base_bits=8, timesteps=[0, 5, 9])
    for name in stats:
        assert float(new_states[name].scale_qk) != 1.0  # updated from default

    # quantized forward with the calibrated mp states runs
    out = unet_apply(
        params,
        cfg,
        x,
        jnp.full((2,), 5.0),
        attn_ctx={"mp_states": new_states, "base_bits": 4, "timestep": 5},
    )
    assert bool(jnp.isfinite(out).all())
