"""InceptionV3 (FID variant) as a pure JAX function.

Port of the canonical FID feature network semantics (the reference vendors
pytorch-fid: pytorch-fid-master/src/pytorch_fid/inception.py — torchvision
InceptionV3 with the FID-specific InceptionA/C/E pooling variants and the
`pt_inception-2015-12-05` weights).  This module implements the architecture
NHWC/HWIO for TPU and converts the torch checkpoint by name when provided
(zero-egress images can't download it; pass a local file).

Eval-mode only: BatchNorm uses running stats (eps 1e-3).  Input is float
[0,1] NHWC at any resolution; it is bilinearly resized to 299 and rescaled
to [-1, 1] (pytorch-fid resize_input/normalize_input defaults).
Output: 2048-d pooled features.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _conv(x, p, stride=1, padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _bn(x, p, eps=1e-3):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _basic(x, p, stride=1, padding="VALID"):
    return jax.nn.relu(_bn(_conv(x, p["conv"], stride, padding), p["bn"]))


def _maxpool3(x, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1), "VALID"
    )


def _avgpool3_noinc(x):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False (the FID
    variant's pooling — plain VALID-window sum divided by true window size)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return s / cnt


def _pad_hw(pad_h, pad_w):
    return [(0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)]


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _inception_a(x, p):
    b1 = _basic(x, p["branch1x1"])
    b5 = _basic(x, p["branch5x5_1"])
    b5 = _basic(jnp.pad(b5, _pad_hw(2, 2)), p["branch5x5_2"])
    b3 = _basic(x, p["branch3x3dbl_1"])
    b3 = _basic(jnp.pad(b3, _pad_hw(1, 1)), p["branch3x3dbl_2"])
    b3 = _basic(jnp.pad(b3, _pad_hw(1, 1)), p["branch3x3dbl_3"])
    bp = _basic(_avgpool3_noinc(x), p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(x, p):
    b3 = _basic(x, p["branch3x3"], stride=2)
    bd = _basic(x, p["branch3x3dbl_1"])
    bd = _basic(jnp.pad(bd, _pad_hw(1, 1)), p["branch3x3dbl_2"])
    bd = _basic(bd, p["branch3x3dbl_3"], stride=2)
    bp = _maxpool3(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(x, p):
    b1 = _basic(x, p["branch1x1"])
    b7 = _basic(x, p["branch7x7_1"])
    b7 = _basic(jnp.pad(b7, _pad_hw(0, 3)), p["branch7x7_2"])
    b7 = _basic(jnp.pad(b7, _pad_hw(3, 0)), p["branch7x7_3"])
    bd = _basic(x, p["branch7x7dbl_1"])
    bd = _basic(jnp.pad(bd, _pad_hw(3, 0)), p["branch7x7dbl_2"])
    bd = _basic(jnp.pad(bd, _pad_hw(0, 3)), p["branch7x7dbl_3"])
    bd = _basic(jnp.pad(bd, _pad_hw(3, 0)), p["branch7x7dbl_4"])
    bd = _basic(jnp.pad(bd, _pad_hw(0, 3)), p["branch7x7dbl_5"])
    bp = _basic(_avgpool3_noinc(x), p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(x, p):
    b3 = _basic(x, p["branch3x3_1"])
    b3 = _basic(b3, p["branch3x3_2"], stride=2)
    b7 = _basic(x, p["branch7x7x3_1"])
    b7 = _basic(jnp.pad(b7, _pad_hw(0, 3)), p["branch7x7x3_2"])
    b7 = _basic(jnp.pad(b7, _pad_hw(3, 0)), p["branch7x7x3_3"])
    b7 = _basic(b7, p["branch7x7x3_4"], stride=2)
    bp = _maxpool3(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(x, p, pool: str):
    b1 = _basic(x, p["branch1x1"])
    b3 = _basic(x, p["branch3x3_1"])
    b3a = _basic(jnp.pad(b3, _pad_hw(0, 1)), p["branch3x3_2a"])
    b3b = _basic(jnp.pad(b3, _pad_hw(1, 0)), p["branch3x3_2b"])
    b3 = jnp.concatenate([b3a, b3b], axis=-1)
    bd = _basic(x, p["branch3x3dbl_1"])
    bd = _basic(jnp.pad(bd, _pad_hw(1, 1)), p["branch3x3dbl_2"])
    bda = _basic(jnp.pad(bd, _pad_hw(0, 1)), p["branch3x3dbl_3a"])
    bdb = _basic(jnp.pad(bd, _pad_hw(1, 0)), p["branch3x3dbl_3b"])
    bd = jnp.concatenate([bda, bdb], axis=-1)
    if pool == "avg":
        bp = _avgpool3_noinc(x)
    else:  # FID variant: Mixed_7c uses max pool
        bp = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
        )
    bp = _basic(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

# (name, type, spec) — spec drives both init and torch conversion
_LAYOUT = [
    ("Conv2d_1a_3x3", "basic", (3, 32, 3, 2, 0)),
    ("Conv2d_2a_3x3", "basic", (32, 32, 3, 1, 0)),
    ("Conv2d_2b_3x3", "basic", (32, 64, 3, 1, 1)),
    ("maxpool1", "maxpool", None),
    ("Conv2d_3b_1x1", "basic", (64, 80, 1, 1, 0)),
    ("Conv2d_4a_3x3", "basic", (80, 192, 3, 1, 0)),
    ("maxpool2", "maxpool", None),
    ("Mixed_5b", "A", (192, 32)),
    ("Mixed_5c", "A", (256, 64)),
    ("Mixed_5d", "A", (288, 64)),
    ("Mixed_6a", "B", (288,)),
    ("Mixed_6b", "C", (768, 128)),
    ("Mixed_6c", "C", (768, 160)),
    ("Mixed_6d", "C", (768, 160)),
    ("Mixed_6e", "C", (768, 192)),
    ("Mixed_7a", "D", (768,)),
    ("Mixed_7b", "E", (1280, "avg")),
    ("Mixed_7c", "E", (2048, "max")),
]


def _init_basic(key, cin, cout, k, dtype=jnp.float32):
    kh = k if isinstance(k, tuple) else (k, k)
    # He init: variance-preserving through ~90 ReLU conv layers.  The old
    # 0.1/sqrt(fan_in) shrank activations ~14x per layer — random-init
    # features collapsed to ~1e-19 and every FID degenerated to 0, making
    # even "relative-only" comparisons meaningless (caught by the r5
    # generate->score verify drive).
    std = math.sqrt(2.0 / (kh[0] * kh[1] * cin))
    return {
        "conv": {"kernel": jax.random.normal(key, (kh[0], kh[1], cin, cout), dtype) * std},
        "bn": {
            "scale": jnp.ones((cout,), dtype),
            "bias": jnp.zeros((cout,), dtype),
            "mean": jnp.zeros((cout,), dtype),
            "var": jnp.ones((cout,), dtype),
        },
    }


def _block_convs(btype, spec):
    """(branch_name -> (cin, cout, k)) for each block type."""
    if btype == "A":
        cin, pf = spec
        return {
            "branch1x1": (cin, 64, 1),
            "branch5x5_1": (cin, 48, 1),
            "branch5x5_2": (48, 64, 5),
            "branch3x3dbl_1": (cin, 64, 1),
            "branch3x3dbl_2": (64, 96, 3),
            "branch3x3dbl_3": (96, 96, 3),
            "branch_pool": (cin, pf, 1),
        }
    if btype == "B":
        (cin,) = spec
        return {
            "branch3x3": (cin, 384, 3),
            "branch3x3dbl_1": (cin, 64, 1),
            "branch3x3dbl_2": (64, 96, 3),
            "branch3x3dbl_3": (96, 96, 3),
        }
    if btype == "C":
        cin, c7 = spec
        return {
            "branch1x1": (cin, 192, 1),
            "branch7x7_1": (cin, c7, 1),
            "branch7x7_2": (c7, c7, (1, 7)),
            "branch7x7_3": (c7, 192, (7, 1)),
            "branch7x7dbl_1": (cin, c7, 1),
            "branch7x7dbl_2": (c7, c7, (7, 1)),
            "branch7x7dbl_3": (c7, c7, (1, 7)),
            "branch7x7dbl_4": (c7, c7, (7, 1)),
            "branch7x7dbl_5": (c7, 192, (1, 7)),
            "branch_pool": (cin, 192, 1),
        }
    if btype == "D":
        (cin,) = spec
        return {
            "branch3x3_1": (cin, 192, 1),
            "branch3x3_2": (192, 320, 3),
            "branch7x7x3_1": (cin, 192, 1),
            "branch7x7x3_2": (192, 192, (1, 7)),
            "branch7x7x3_3": (192, 192, (7, 1)),
            "branch7x7x3_4": (192, 192, 3),
        }
    if btype == "E":
        cin, _pool = spec
        return {
            "branch1x1": (cin, 320, 1),
            "branch3x3_1": (cin, 384, 1),
            "branch3x3_2a": (384, 384, (1, 3)),
            "branch3x3_2b": (384, 384, (3, 1)),
            "branch3x3dbl_1": (cin, 448, 1),
            "branch3x3dbl_2": (448, 384, 3),
            "branch3x3dbl_3a": (384, 384, (1, 3)),
            "branch3x3dbl_3b": (384, 384, (3, 1)),
            "branch_pool": (cin, 192, 1),
        }
    raise ValueError(btype)


def inception_init(key: jax.Array) -> Dict:
    params = {}
    keys = iter(jax.random.split(key, 256))
    for name, btype, spec in _LAYOUT:
        if btype == "maxpool":
            continue
        if btype == "basic":
            cin, cout, k, _s, _p = spec
            params[name] = _init_basic(next(keys), cin, cout, k)
        else:
            params[name] = {
                bn: _init_basic(next(keys), cin, cout, k)
                for bn, (cin, cout, k) in _block_convs(btype, spec).items()
            }
    return params


def inception_apply(params: Dict, x: jax.Array, *, resize_input=True, normalize_input=True):
    """x: [N,H,W,3] float in [0,1] -> features [N, 2048]."""
    if resize_input:
        N, H, W, C = x.shape
        x = jax.image.resize(x, (N, 299, 299, C), method="bilinear")
    if normalize_input:
        x = 2.0 * x - 1.0

    for name, btype, spec in _LAYOUT:
        if btype == "maxpool":
            x = _maxpool3(x)
        elif btype == "basic":
            _cin, _cout, _k, stride, pad = spec
            if pad:
                x = jnp.pad(x, _pad_hw(pad, pad))
            x = _basic(x, params[name], stride=stride)
        elif btype == "A":
            x = _inception_a(x, params[name])
        elif btype == "B":
            x = _inception_b(x, params[name])
        elif btype == "C":
            x = _inception_c(x, params[name])
        elif btype == "D":
            x = _inception_d(x, params[name])
        elif btype == "E":
            x = _inception_e(x, params[name], spec[1])
    return x.mean(axis=(1, 2))  # adaptive avg pool -> [N, 2048]


@dataclasses.dataclass
class InceptionV3FID:
    """Bundled feature extractor: `extract(x01_nhwc) -> [N, 2048]`."""

    params: Dict

    @classmethod
    def random(cls, seed: int = 0) -> "InceptionV3FID":
        return cls(params=inception_init(jax.random.PRNGKey(seed)))

    @classmethod
    def from_torch(cls, path: str) -> "InceptionV3FID":
        return cls(params=load_torch_inception(path))

    def extract(self, x):
        return inception_apply(self.params, x)


def load_torch_inception(path: str) -> Dict:
    """Convert the pt_inception-2015-12-05 (or torchvision inception_v3)
    state dict by name: `<block>.<branch>.conv.weight` / `.bn.{weight,bias,
    running_mean,running_var}` -> our pytree (OIHW -> HWIO)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(sd, dict) or "state_dict" in sd:
        sd = sd.get("state_dict", sd)
    params = inception_init(jax.random.PRNGKey(0))

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    loaded = 0
    for name, btype, spec in _LAYOUT:
        if btype == "maxpool":
            continue
        targets = {None: params[name]} if btype == "basic" else params[name]
        for branch, node in (targets.items() if btype != "basic" else [(None, params[name])]):
            prefix = name if branch is None else f"{name}.{branch}"
            w = sd.get(f"{prefix}.conv.weight")
            if w is None:
                raise KeyError(f"missing {prefix}.conv.weight in {path}")
            node["conv"]["kernel"] = jnp.asarray(np.transpose(to_np(w), (2, 3, 1, 0)))
            node["bn"]["scale"] = jnp.asarray(to_np(sd[f"{prefix}.bn.weight"]))
            node["bn"]["bias"] = jnp.asarray(to_np(sd[f"{prefix}.bn.bias"]))
            node["bn"]["mean"] = jnp.asarray(to_np(sd[f"{prefix}.bn.running_mean"]))
            node["bn"]["var"] = jnp.asarray(to_np(sd[f"{prefix}.bn.running_var"]))
            loaded += 1
    return params
