from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch, replicate
from .distributed import initialize_distributed
from .tp import (
    unet_param_specs,
    shard_unet_params,
    shard_batch_spatial,
    sharded_fraction,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "initialize_distributed",
    "unet_param_specs",
    "shard_unet_params",
    "shard_batch_spatial",
    "sharded_fraction",
]
