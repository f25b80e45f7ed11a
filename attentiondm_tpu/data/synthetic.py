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


# ---------------------------------------------------------------------------
# natural-statistics distribution (VERDICT r3 item 6)
#
# The procedural shapes above are learnable but too CLEAN: piecewise-smooth
# regions with bounded color never produce the heavy-tailed, outlier-channel
# activation statistics of natural photographs, so quantization-quality
# numbers measured on them can flatter W4.  This distribution matches the
# three statistics that drive activation outliers in real CIFAR-scale
# models:
#   - 1/f^alpha power spectrum (alpha ~ 2; Ruderman 1994) via an on-device
#    FFT filter of white noise,
#   - CIFAR-like color covariance: components drawn in the opponent color
#     basis (luminance dominant, ~(1, 0.4, 0.15) relative sd),
#   - heavy-tailed contrast: per-image lognormal gain, so a tail of images
#     clips hard (the outlier images real calibration sets contain),
# plus 0-3 of the sharp occluding shapes for object-like edges.
# ---------------------------------------------------------------------------

# opponent color basis (rows): luminance, red-green, blue-yellow
_COLOR_BASIS = jnp.asarray(
    [[0.5774, 0.5774, 0.5774], [0.7071, 0.0, -0.7071], [0.4082, -0.8165, 0.4082]],
    jnp.float32,
)
_COLOR_SD = jnp.asarray([1.0, 0.40, 0.15], jnp.float32)


def _pink_field(key, res, alpha):
    """[res, res, 3] correlated-color 1/f^alpha noise, unit-ish scale."""
    kw, = jax.random.split(key, 1)
    white = jax.random.normal(kw, (3, res, res))
    fy = jnp.fft.fftfreq(res)[:, None]
    fx = jnp.fft.fftfreq(res)[None, :]
    f = jnp.sqrt(fy * fy + fx * fx)
    amp = (f + 1.0 / res) ** (-alpha / 2.0)
    amp = amp / jnp.sqrt(jnp.mean(amp * amp))  # unit RMS filter gain
    pink = jnp.fft.ifft2(jnp.fft.fft2(white) * amp[None]).real  # [3, res, res]
    # color: opponent components scaled then rotated to RGB
    rgb = jnp.einsum("cij,cd->ijd", pink * _COLOR_SD[:, None, None], _COLOR_BASIS)
    return rgb


def _one_natural(key, res):
    kf, ka, kg, km, ks = jax.random.split(key, 5)
    alpha = jax.random.uniform(ka, (), minval=1.6, maxval=2.4)
    img = _pink_field(kf, res, alpha)
    img = img / (jnp.std(img) + 1e-6)
    # heavy-tailed per-image contrast + mean color: the clip below then
    # saturates the top of the gain distribution, like over/under-exposed
    # photos — exactly the calibration outliers the protocol needs
    gain = 0.45 * jnp.exp(0.6 * jax.random.normal(kg, ()))
    mean = 0.25 * jax.random.normal(km, (3,))
    img = img * gain + mean
    for i in range(3):  # object-like occluders with sharp edges
        kms, kcol, kon = jax.random.split(jax.random.fold_in(ks, i), 3)
        mask = _shape_mask(kms, res)[..., None]
        color = jax.random.uniform(kcol, (3,), minval=-1.0, maxval=1.0)
        mask = mask * jax.random.bernoulli(kon, 0.5).astype(jnp.float32)
        img = mask * color + (1.0 - mask) * img
    return jnp.clip(img, -1.0, 1.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def natural_batch(key, batch: int, res: int = 32) -> jax.Array:
    """[batch, res, res, 3] float32 in [-1, 1] with natural-image statistics
    (1/f^alpha spectrum, opponent-color covariance, lognormal contrast)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: _one_natural(k, res))(keys)
