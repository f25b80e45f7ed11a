"""Pallas implicit-im2col int8 conv (ops/pallas_conv.py): exactness vs the
XLA int8 conv the serving path runs today, epilogue fusion, block sizing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentiondm_tpu.ops.pallas_conv import (
    _block_bt,
    conv3_pallas_fits,
    int8_conv3_pallas,
)


def _ref_conv(xp, gq_flat):
    Cp = gq_flat.shape[0] // 9
    return jax.lax.conv_general_dilated(
        xp, gq_flat.reshape(3, 3, Cp, gq_flat.shape[-1]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


@pytest.mark.parametrize("B,H,C,N", [(4, 8, 128, 128), (2, 4, 256, 128)])
def test_int32_exact_vs_xla(B, H, C, N):
    k = jax.random.PRNGKey(0)
    xp = jax.random.randint(k, (B, H + 2, H + 2, C), -128, 128, jnp.int8)
    gq = jax.random.randint(jax.random.PRNGKey(1), (9 * C, N), -8, 8, jnp.int8)
    ours = int8_conv3_pallas(xp, gq, jnp.ones((N,)), jnp.zeros((N,)),
                             out_dtype=jnp.int32)
    theirs = _ref_conv(xp, gq)
    assert ours.dtype == jnp.int32 and ours.shape == (B, H, H, N)
    assert int(jnp.abs(ours - theirs).max()) == 0


def test_fused_epilogue_matches_reference_formula():
    B, H, C, N = 2, 6, 128, 128
    k = jax.random.PRNGKey(2)
    xp = jax.random.randint(k, (B, H + 2, H + 2, C), -128, 128, jnp.int8)
    gq = jax.random.randint(jax.random.PRNGKey(3), (9 * C, N), -8, 8, jnp.int8)
    inv_ws = jax.random.uniform(jax.random.PRNGKey(4), (N,), minval=0.5) * 1e-2
    zcb = jax.random.normal(jax.random.PRNGKey(5), (N,)) * 0.1
    ours = int8_conv3_pallas(xp, gq, inv_ws, zcb, out_dtype=jnp.float32)
    want = _ref_conv(xp, gq).astype(jnp.float32) * inv_ws + zcb
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # bf16 output = the serving dot_bf16 layout
    bf = int8_conv3_pallas(xp, gq, inv_ws, zcb, out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(bf, np.float32), np.asarray(want), rtol=1e-2, atol=1e-2
    )


def test_block_bt_divides_and_fits():
    for B, H, W, Cp, Np in [(128, 32, 32, 128, 128), (128, 16, 16, 256, 256),
                            (128, 8, 8, 512, 256), (96, 4, 4, 512, 256)]:
        bt = _block_bt(B, H, W, Cp, Np, 2)
        assert B % bt == 0 and bt >= 1
    assert conv3_pallas_fits(128, 16, 16, 256, 256)
    assert not conv3_pallas_fits(128, 16, 16, 200, 256)  # lane-misaligned
