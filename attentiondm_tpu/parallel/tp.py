"""Tensor-parallel (and spatial-parallel) shardings for the UNet.

The reference has no model parallelism at all (its DataParallel wrapper is
batch replication; SURVEY.md §2.1-2.2).  On TPU the idiomatic route is the
GSPMD recipe: build a 2-D ``(data, model)`` `jax.sharding.Mesh`, annotate the
*parameter pytree* with `PartitionSpec`s, and let XLA's SPMD partitioner
insert the collectives (psum over ICI) — no hand-written communication.

Layout (Megatron-style pairing, one psum per resblock / two per attention):

  resblock   conv1, temb_proj   column-parallel  (out-channels sharded)
             norm2              sharded over C   (GroupNorm stats stay
                                                  shard-local: TP degree m
                                                  divides the 32 groups, so a
                                                  contiguous C shard holds
                                                  whole groups)
             conv2              row-parallel     (in-channels sharded ->
                                                  XLA inserts one psum)
             norm1 / shortcut   replicated       (block enters & exits with
                                                  replicated activations, so
                                                  residual adds & skip concats
                                                  need no layout juggling)
  attention  q, k, v            column-parallel  (C contraction in QK^T ->
                                                  psum; logits replicated)
             proj_out           row-parallel     (second psum)
  temb MLP, conv_in/out, norm_out, up/downsample: replicated (tiny).

Spatial parallelism (for 256x256 LSUN-scale activations) needs NO parameter
sharding at all: shard the activation H axis over the mesh and GSPMD
spatially partitions the convolutions with halo exchanges, psums the
GroupNorm spatial statistics, and all-gathers K/V inside attention.  See
``shard_batch_spatial`` and tests/test_tp.py.

Pipeline/expert parallelism are not applicable to this model family (a
single-stack UNet with no MoE layers); dp x tp x sp is the complete
parallelism surface for the reference's workload envelope.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parameter-tree leaves routed by the NAME of their enclosing module
# (the param tree mirrors the torch DDIM module tree — models/unet.py).
_COLUMN = ("conv1", "temb_proj", "q", "k", "v", "query_conv", "key_conv", "value_conv")
_ROW = ("conv2", "proj_out", "output_conv")
_SHARDED_NORM = ("norm2",)


def _spec_for(path_names, leaf, axis):
    """PartitionSpec for one param leaf given its key path (module names)."""
    mod = next((n for n in reversed(path_names) if n not in ("kernel", "bias", "scale")), "")
    name = path_names[-1]
    nd = leaf.ndim
    if mod in _COLUMN:
        if name == "kernel":
            # conv HWIO -> shard O; dense (cin, cout) -> shard cout
            return P(*([None] * (nd - 1)), axis)
        return P(axis)  # bias lives on the sharded output channels
    if mod in _ROW:
        if name == "kernel":
            # conv HWIO -> shard I; dense (cin, cout) -> shard cin
            spec = [None] * nd
            spec[-2] = axis
            return P(*spec)
        return P()  # bias applies after the psum, replicated
    if mod in _SHARDED_NORM:
        return P(axis)  # norm over the column-sharded intermediate
    return P()


def unet_param_specs(params, axis: str = "model"):
    """PartitionSpec pytree matching `params` (the unet_init tree)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(
            [k.key if hasattr(k, "key") else str(k.idx) for k in path], leaf, axis
        ),
        params,
    )


def _check_divisibility(params, specs, mesh, axis):
    m = mesh.shape[axis]
    for (path, leaf), (_, spec) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(specs, is_leaf=lambda x: isinstance(x, P)),
    ):
        for dim, name in enumerate(spec):
            if name == axis and leaf.shape[dim] % m:
                raise ValueError(
                    f"{jax.tree_util.keystr(path)}: dim {dim} ({leaf.shape[dim]}) "
                    f"not divisible by tp degree {m}"
                )


def shard_unet_params(mesh: Mesh, params, axis: str = "model"):
    """device_put the param tree with tensor-parallel shardings over `mesh`.

    GroupNorm statistics stay communication-free only when the tp degree
    divides the group count (32): a contiguous C shard then holds whole
    groups.  Validated here rather than discovered as a wrong answer.
    """
    m = mesh.shape[axis]
    if 32 % m:
        raise ValueError(f"tp degree {m} must divide the 32 GroupNorm groups")
    specs = unet_param_specs(params, axis)
    _check_divisibility(params, specs, mesh, axis)
    return jax.device_put(
        params, jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
    )


def shard_batch_spatial(mesh: Mesh, x, *, data_axis: str = "data", spatial_axis: str = "model"):
    """Shard activations (N,H,W,C) over batch AND image height.

    Params stay replicated; GSPMD spatially partitions the convs (halo
    exchange on the 3x3s) and psums the GroupNorm spatial statistics.  This
    is the memory story for 256x256 inputs, where one image's activations
    dominate HBM, orthogonal to tensor parallelism's weight sharding.
    """
    return jax.device_put(x, NamedSharding(mesh, P(data_axis, spatial_axis)))


def sharded_fraction(params, specs) -> float:
    """Fraction of parameter BYTES carrying a sharded PartitionSpec."""
    tot = sh = 0
    for leaf, spec in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P)),
    ):
        n = leaf.size * leaf.dtype.itemsize
        tot += n
        if any(s is not None for s in spec):
            sh += n
    return sh / max(tot, 1)
