import numpy as np
import jax
import jax.numpy as jnp
import pytest

from attentiondm_tpu.ops.attention import flash_attention, spatial_attention


def _ref(q, k, v, scale):
    w = jnp.einsum("blc,bmc->blm", q, k) * scale
    w = jax.nn.softmax(w, axis=-1)
    return jnp.einsum("blm,bmc->blc", w, v)


@pytest.mark.parametrize("L,D", [(512, 128), (1024, 128)])
def test_flash_matches_dense(L, D):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    B = 2
    q = jax.random.normal(ks[0], (B, L, D))
    k = jax.random.normal(ks[1], (B, L, D))
    v = jax.random.normal(ks[2], (B, L, D))
    scale = D ** -0.5
    out = flash_attention(q, k, v, scale=scale, block_q=256, block_k=256, interpret=True)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_extreme_logits_stable():
    """online softmax must survive large logit magnitudes."""
    B, L, D = 1, 512, 128
    q = jnp.ones((B, L, D)) * 30.0
    k = jnp.ones((B, L, D)) * 30.0
    v = jax.random.normal(jax.random.PRNGKey(1), (B, L, D))
    out = flash_attention(q, k, v, scale=1.0, interpret=True)
    assert bool(jnp.isfinite(out).all())
    # uniform attention -> output = mean of v
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(v.mean(axis=1)[0]), atol=1e-4)


def test_spatial_attention_dispatch():
    # short sequence -> dense path; still correct
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (2, 256, 64))
    k = jax.random.normal(ks[1], (2, 256, 64))
    v = jax.random.normal(ks[2], (2, 256, 64))
    out = spatial_attention(q, k, v)
    ref = _ref(q, k, v, 64 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
