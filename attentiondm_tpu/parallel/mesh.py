"""Device mesh + sharding helpers.

The reference's parallelism story was `torch.nn.DataParallel` (immediately
unwrapped for sampling) plus dead NCCL scaffolding (SURVEY.md §2.1-2.2).
The TPU-native replacement is explicit: a `jax.sharding.Mesh` over the local
(or multi-host) device set, batch-sharded sampling/training via NamedSharding,
and XLA-inserted collectives over ICI — no hand-written communication.

Sampling for FID (the 50k-image workload) is embarrassingly parallel over
batch, so a 1-D "data" mesh covers the reference's entire workload envelope;
the helpers below also accept a 2-D (data, model) mesh for activation-channel
sharding of the big 256x256 LSUN UNets.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int | None = None,
    axes: Sequence[str] = ("data",),
    shape: Sequence[int] | None = None,
) -> Mesh:
    """1-D (or reshaped N-D) mesh over the first `num_devices` devices.

    `shape` pins the per-axis split explicitly (e.g. (2, 4) for dp=2 x tp=4);
    without it a 2-D mesh favors the data axis with model=2.
    """
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(f"requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    n = len(devs)
    if shape is not None:
        if len(shape) != len(axes) or int(np.prod(shape)) != n:
            raise ValueError(f"mesh shape {shape} does not cover {n} devices / axes {axes}")
        shape = tuple(shape)
    elif len(axes) == 1:
        shape = (n,)
    elif len(axes) == 2:
        # favor the data axis; model axis gets the largest power-of-two
        # divisor <= 2 unless n is bigger
        model = 2 if n % 2 == 0 and n > 1 else 1
        shape = (n // model, model)
    else:
        raise ValueError("1-D or 2-D meshes only (pass `shape` for more)")
    return Mesh(np.asarray(devs).reshape(shape), axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    return jax.device_put(x, batch_sharding(mesh, axis))


def replicate(mesh: Mesh, tree):
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)
