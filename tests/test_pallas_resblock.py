"""Whole-resblock fused Pallas kernel (ops/pallas_resblock.py) vs the
unfused serving chain, standalone and through the serving forward."""
import jax
import jax.numpy as jnp
import numpy as np

from attentiondm_tpu.ops.pallas_resblock import (
    _block_bt,
    resblock_pallas,
    resblock_pallas_fits,
)


def _ref_resblock(r, tproj, gn1, q1, g1, sb1, gn2, q2, g2, sb2, a_bit=8):
    """The serving path's unfused math, straight jnp."""
    from attentiondm_tpu.models.unet import group_norm, swish
    from attentiondm_tpu.quant.int8_serving import _quant_i8, int8_conv3_qzero

    def half(h, gn_p, q, g, sb):
        h = swish(group_norm(h, {"scale": gn_p[0], "bias": gn_p[1]}))
        hq = _quant_i8(h, q[0], q[1], a_bit)
        dot = int8_conv3_qzero(hq, q[1], a_bit, g)
        return dot.astype(jnp.float32) * sb[0] + sb[1]

    h = half(r.astype(jnp.float32), gn1, q1, g1, sb1)
    h = h + tproj[:, None, None, :]
    h = half(h, gn2, q2, g2, sb2)
    return r.astype(jnp.float32) + h


def _make(B=4, H=8, C=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    r = jax.random.normal(ks[0], (B, H, H, C))
    tproj = jax.random.normal(ks[1], (B, C)) * 0.1
    gn1 = (1.0 + 0.1 * jax.random.normal(ks[2], (C,)),
           0.1 * jax.random.normal(ks[3], (C,)))
    gn2 = (1.0 + 0.1 * jax.random.normal(ks[4], (C,)),
           0.1 * jax.random.normal(ks[5], (C,)))
    scale1 = jnp.abs(jax.random.normal(ks[6], (C,))) * 20 + 30
    zp1 = jnp.round(jax.random.normal(ks[7], (C,)) * 3)
    scale2 = jnp.abs(jax.random.normal(ks[8], (C,))) * 20 + 30
    zp2 = jnp.round(jax.random.normal(ks[9], (C,)) * 3)
    g1 = jax.random.randint(ks[10], (9 * C, C), -8, 8, jnp.int8)
    g2 = jax.random.randint(ks[11], (9 * C, C), -8, 8, jnp.int8)
    sb1 = (jnp.full((C,), 3e-4), 0.01 * jnp.ones((C,)))
    sb2 = (jnp.full((C,), 3e-4), 0.01 * jnp.ones((C,)))
    return r, tproj, gn1, (scale1, zp1), g1, sb1, gn2, (scale2, zp2), g2, sb2


def test_matches_unfused_chain_f32():
    r, tproj, gn1, q1, g1, sb1, gn2, q2, g2, sb2 = _make()
    got = resblock_pallas(r, tproj, gn1[0], gn1[1], q1, g1, sb1,
                          gn2[0], gn2[1], q2, g2, sb2,
                          out_dtype=jnp.float32)
    want = _ref_resblock(r, tproj, gn1, q1, g1, sb1, gn2, q2, g2, sb2)
    err = float(jnp.abs(got - want).max())
    # identical math modulo f32 reduction order in the GN stats; the int8
    # rounding decisions must coincide except on exact ties
    rel = float(jnp.abs(got - want).mean() / (jnp.abs(want).mean() + 1e-9))
    assert rel < 5e-3, (rel, err)


def test_bf16_output_and_block_sizing():
    r, tproj, gn1, q1, g1, sb1, gn2, q2, g2, sb2 = _make(B=6)
    got = resblock_pallas(r.astype(jnp.bfloat16), tproj, gn1[0], gn1[1],
                          q1, g1, sb1, gn2[0], gn2[1], q2, g2, sb2,
                          out_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16 and got.shape == r.shape
    want = _ref_resblock(r.astype(jnp.bfloat16), tproj, gn1, q1, g1, sb1,
                         gn2, q2, g2, sb2)
    rel = float(jnp.abs(got.astype(jnp.float32) - want).mean()
                / (jnp.abs(want).mean() + 1e-9))
    assert rel < 2e-2, rel
    # block sizing: divides B (or 1), and the shipping shapes fit
    for B, H, C in [(128, 32, 128), (128, 16, 256), (128, 8, 256), (128, 4, 256)]:
        bt = _block_bt(B, H, H, C)
        assert B % bt == 0
        assert resblock_pallas_fits(B, H, H, C), (B, H, C)
    assert not resblock_pallas_fits(128, 16, 16, 200)  # lane-misaligned


def test_serving_forward_takes_mega_kernel():
    """resblock_pallas on the serving forward routes identity-residual resblocks
    through the mega-kernel and stays at rounding distance from the
    unfused chain."""
    from attentiondm_tpu.models import UNetConfig, unet_init
    from attentiondm_tpu.quant import QuantizedUNet, calibrate_ranges
    from attentiondm_tpu.quant.int8_serving import (
        prepare_serving_runtime,
        serving_model_fn,
    )

    cfg = UNetConfig(ch=128, ch_mult=(1,), num_res_blocks=1,
                     attn_resolutions=(8,), resolution=8, dropout=0.0)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qunet = QuantizedUNet.create(cfg, 8)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 8, 8, 3))
    seq = [0, 900]
    qstates = calibrate_ranges(qunet, params, qunet.init_state(2), xs, seq, first=True)
    runtime = prepare_serving_runtime(qunet, params, qstates)
    x, t = xs[0], jnp.full((2,), 5.0)
    base = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False)(
        x, t, jnp.asarray(0))
    mega = serving_model_fn(qunet, runtime, params, qstates, attn_int8=False,
                            resblock_pallas="all")(x, t, jnp.asarray(0))
    rel = float(jnp.abs(mega - base).mean() / (jnp.abs(base).mean() + 1e-9))
    assert np.isfinite(rel) and rel < 0.02, rel
