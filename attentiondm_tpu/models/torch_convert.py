"""PyTorch DDIM checkpoint -> JAX param pytree converter.

The published checkpoints (functions/ckpt_util.py:15-34 in the reference:
cifar10 model-790000.ckpt, lsun_* etc.) are state dicts of the original DDIM
torch model with keys like::

    temb.dense.0.weight        [temb_ch, ch]
    conv_in.weight             [C_out, C_in, kH, kW]
    down.0.block.0.norm1.weight
    down.0.attn.0.q.weight     [C, C, 1, 1]
    down.0.downsample.conv.weight
    mid.block_1.temb_proj.bias
    up.1.upsample.conv.weight
    norm_out.weight / conv_out.bias

Mapping to our pytree is name-structural (no positional shape matching — the
reference loaded checkpoints by walking two state dicts in parallel and
assigning on shape coincidence, defect D6).  Layout transposes:
conv OIHW -> HWIO, linear [out, in] -> [in, out].
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from .unet import UNetConfig, unet_init


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _t_dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))  # [out,in] -> [in,out]


def params_to_torch_names(cfg: UNetConfig) -> Dict[str, str]:
    """Map of torch state-dict key -> pytree path string ('down/0/block/1/conv1/kernel')."""
    import jax

    params = unet_init(jax.random.PRNGKey(0), cfg)
    mapping: Dict[str, str] = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + [k])
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                walk(v, path + [str(i)])
        else:
            mapping["/".join(path)] = None

    walk(params, [])
    out = {}
    for jpath in mapping:
        parts = jpath.split("/")
        leaf = parts[-1]
        stem = parts[:-1]
        # temb/dense0 -> temb.dense.0
        tparts = []
        for p in stem:
            if p == "dense0":
                tparts += ["dense", "0"]
            elif p == "dense1":
                tparts += ["dense", "1"]
            else:
                tparts.append(p)
        tleaf = {"kernel": "weight", "bias": "bias", "scale": "weight"}[leaf]
        out[".".join(tparts + [tleaf])] = jpath
    return out


def convert_ddim_state_dict(state_dict: Mapping[str, "np.ndarray"], cfg: UNetConfig):
    """Convert a torch DDIM state dict (tensors or ndarrays) to our pytree.

    Raises KeyError listing any unmapped checkpoint keys — loading is strict
    by design (anti-D6).
    """
    import jax

    params = unet_init(jax.random.PRNGKey(0), cfg)
    name_map = params_to_torch_names(cfg)

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    sd = {k: to_np(v) for k, v in state_dict.items()}
    unmapped = [k for k in sd if k not in name_map]
    missing = [k for k in name_map if k not in sd]
    if unmapped or missing:
        raise KeyError(
            f"checkpoint/model name mismatch; unmapped ckpt keys: {unmapped[:10]} "
            f"(+{max(0, len(unmapped) - 10)} more); missing from ckpt: {missing[:10]} "
            f"(+{max(0, len(missing) - 10)} more)"
        )

    for tkey, jpath in name_map.items():
        arr = sd[tkey]
        parts = jpath.split("/")
        leaf = parts[-1]
        if leaf == "kernel":
            arr = _t_conv(arr) if arr.ndim == 4 else _t_dense(arr)
        node = params
        for p in parts[:-1]:
            node = node[int(p)] if isinstance(node, list) else node[p]
        expect = node[leaf].shape
        if tuple(arr.shape) != tuple(expect):
            raise ValueError(f"shape mismatch for {tkey} -> {jpath}: {arr.shape} vs {expect}")
        node[leaf] = jnp.asarray(arr, jnp.float32)
    return params


def load_torch_checkpoint(path: str, cfg: UNetConfig, ema: bool = False):
    """Load a .ckpt/.pth file saved by torch and convert.

    Handles both a bare state dict and the reference's training-states list
    `[model_sd, optim_sd, epoch, step, (ema_sd)]` (runners/diffusion.py:177-191);
    `ema=True` selects states[-1] — the reference does this for CelebA
    (runners/diffusion.py:374-375).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, (list, tuple)):
        obj = obj[-1] if ema else obj[0]
    if not isinstance(obj, Mapping):
        raise TypeError(f"unsupported checkpoint object: {type(obj)}")
    # strip DataParallel "module." prefixes
    obj = { (k[7:] if k.startswith("module.") else k): v for k, v in obj.items() }
    return convert_ddim_state_dict(obj, cfg)
