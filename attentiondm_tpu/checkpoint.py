"""Checkpoint save/load for arbitrary JAX pytrees.

Name-keyed and self-describing (numpy .npz of flattened key paths), unlike
the reference's positional shape-matched torch loading (defect D6).  Covers
training states (params/opt/ema/step), quant states, and plain param trees.
For the published torch DDIM checkpoints use
`models.torch_convert.load_torch_checkpoint` instead.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree):
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [str(k)])
        elif isinstance(node, (list, tuple)):
            flat["/".join(path) + "/__len__"] = np.asarray(len(node))
            for i, v in enumerate(node):
                walk(v, path + [str(i)])
        elif node is None:
            flat["/".join(path) + "/__none__"] = np.asarray(0)
        elif hasattr(node, "__dataclass_fields__"):
            flat["/".join(path) + "/__dc__"] = np.frombuffer(
                type(node).__module__.encode() + b"|" + type(node).__qualname__.encode(),
                dtype=np.uint8,
            )
            for f in node.__dataclass_fields__:
                walk(getattr(node, f), path + [f])
        else:
            flat["/".join(path)] = np.asarray(node)

    walk(tree, [])
    return flat


def save_checkpoint(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    tmp = path + ".tmp"
    np.savez(tmp, **flat)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path: str, like):
    """Load into the structure of `like` (same treedef), returning new arrays."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}

    def walk(node, path_):
        key = "/".join(path_)
        if isinstance(node, dict):
            return {k: walk(v, path_ + [str(k)]) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            n = int(flat[key + "/__len__"])
            out = [walk(node[i] if i < len(node) else None, path_ + [str(i)]) for i in range(n)]
            if isinstance(node, tuple):
                # namedtuples (e.g. optax states) take positional args
                return type(node)(*out) if hasattr(node, "_fields") else type(node)(out)
            return out
        if node is None:
            return None
        if hasattr(node, "__dataclass_fields__"):
            kw = {f: walk(getattr(node, f), path_ + [f]) for f in node.__dataclass_fields__}
            return type(node)(**kw)
        if key not in flat:
            raise KeyError(f"checkpoint missing key {key}")
        arr = flat[key]
        import jax.numpy as jnp

        return jnp.asarray(arr)

    return walk(like, [])
