"""Procedural image distribution for on-device training without a dataset.

Zero-egress environments cannot fetch CIFAR-10 or the published
`model-790000.ckpt`, but the quality protocol (tools/quality_protocol.py)
needs *trained* weights — quantization error measured on random-init weights
says nothing about real deployments (activations have no learned structure).
This module generates a structured, learnable image distribution entirely on
device: smooth two-tone Fourier backgrounds composited with anti-aliased
circles and rectangles at random positions/colors.  A denoiser trained on it
develops realistic activation statistics (multi-scale edges, flat regions,
color correlations) so quantization degradation can be measured on weights
that actually do something.

Everything is jit-friendly: fixed shape counts, no data-dependent control
flow, vmapped over per-image PRNG keys.  Images are NHWC float32 in [-1, 1]
(the model's data domain after data_transform, matching the CIFAR pipeline
in data/datasets.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

N_SHAPES = 4  # static composite depth


def _background(key, res):
    """Smooth low-frequency two-color field: c0 + (c1-c0) * field(x, y)."""
    k1, k2, k3 = jax.random.split(key, 3)
    c0 = jax.random.uniform(k1, (3,), minval=-1.0, maxval=1.0)
    c1 = jax.random.uniform(k2, (3,), minval=-1.0, maxval=1.0)
    freq = jax.random.uniform(k3, (4,), minval=-2.0, maxval=2.0)
    yy, xx = jnp.meshgrid(
        jnp.linspace(0.0, 1.0, res), jnp.linspace(0.0, 1.0, res), indexing="ij"
    )
    phase = freq[0] * xx + freq[1] * yy + freq[2] * xx * yy + freq[3]
    field = 0.5 + 0.5 * jnp.cos(jnp.pi * phase)  # [res, res] in [0, 1]
    return c0 + (c1 - c0) * field[..., None]  # [res, res, 3]


def _shape_mask(key, res):
    """Anti-aliased mask of one random shape (circle or axis-aligned box)."""
    kt, kc, ks, ka = jax.random.split(key, 4)
    yy, xx = jnp.meshgrid(
        jnp.linspace(0.0, 1.0, res), jnp.linspace(0.0, 1.0, res), indexing="ij"
    )
    center = jax.random.uniform(kc, (2,), minval=0.15, maxval=0.85)
    size = jax.random.uniform(ks, (2,), minval=0.08, maxval=0.3)
    aa = 1.5 / res  # ~1.5 px anti-aliasing band

    # signed distances (negative inside)
    d_circle = jnp.hypot(yy - center[0], xx - center[1]) - size[0]
    d_box = jnp.maximum(jnp.abs(yy - center[0]) - size[0],
                        jnp.abs(xx - center[1]) - size[1])
    is_circle = jax.random.bernoulli(kt)
    d = jnp.where(is_circle, d_circle, d_box)
    return jax.nn.sigmoid(-d / aa)  # [res, res] in (0, 1)


def _one_image(key, res):
    kb, kf = jax.random.split(key)
    img = _background(kb, res)
    for i in range(N_SHAPES):
        km, kcol, kon = jax.random.split(jax.random.fold_in(kf, i), 3)
        mask = _shape_mask(km, res)[..., None]
        color = jax.random.uniform(kcol, (3,), minval=-1.0, maxval=1.0)
        # each shape present with p=0.75 so composite depth varies
        mask = mask * jax.random.bernoulli(kon, 0.75).astype(jnp.float32)
        img = mask * color + (1.0 - mask) * img
    return jnp.clip(img, -1.0, 1.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def synthetic_batch(key, batch: int, res: int = 32) -> jax.Array:
    """[batch, res, res, 3] float32 in [-1, 1], deterministic in `key`."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: _one_image(k, res))(keys)
