from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_params_fsdp,
    replicate_tree,
)
from .spatial import shard_spatial, spatial_sharding

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_params_fsdp",
    "replicate_tree",
    "shard_spatial",
    "spatial_sharding",
]
