"""Data transforms (pure numpy/jax; reference datasets/__init__.py:184-215).

Images flow as float32 NHWC in [0, 1]; `data_transform` maps to model space
(dequantization / logit / rescale to [-1, 1]) and `inverse_data_transform`
maps model outputs back to displayable [0, 1].
"""
from __future__ import annotations

import numpy as np


def logit_transform(image, lam: float = 1e-6):
    image = lam + (1 - 2 * lam) * image
    return np.log(image) - np.log1p(-image)


def data_transform(config, x, rng: np.random.Generator | None = None):
    d = config.data
    x = np.asarray(x, np.float32)
    if getattr(d, "uniform_dequantization", False):
        rng = rng or np.random.default_rng()
        x = (x * 255.0 + rng.uniform(size=x.shape)) / 256.0
    if getattr(d, "gaussian_dequantization", False):
        rng = rng or np.random.default_rng()
        x = x + rng.normal(size=x.shape).astype(np.float32) * 0.01
    if getattr(d, "rescaled", False):
        x = 2 * x - 1.0
    elif getattr(d, "logit_transform", False):
        x = logit_transform(x)
    return x.astype(np.float32)


def inverse_data_transform(config, x):
    d = config.data
    x = np.asarray(x, np.float32)
    if getattr(d, "logit_transform", False):
        x = 1.0 / (1.0 + np.exp(-x))
    elif getattr(d, "rescaled", False):
        x = (x + 1.0) / 2.0
    return np.clip(x, 0.0, 1.0)


def inverse_transform_uint8_fn(config):
    """Device-side inverse transform straight to uint8 pixels (jit-able).

    The 50k `--fid` loop pulls every batch through the TPU relay; converting
    on device shrinks the host transfer 4x (f32 -> uint8) and moves the
    clip/scale work off the host encode path.  Same formula as
    `inverse_data_transform` + native.write_png_batch's quantization
    (clip to [0,1], * 255 + 0.5, truncate).
    """
    import jax
    import jax.numpy as jnp

    d = config.data
    logit = bool(getattr(d, "logit_transform", False))
    rescaled = bool(getattr(d, "rescaled", False))

    @jax.jit
    def fn(x):
        x = x.astype(jnp.float32)
        if logit:
            x = jax.nn.sigmoid(x)
        elif rescaled:
            x = (x + 1.0) / 2.0
        return (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    return fn
