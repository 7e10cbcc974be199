from .mesh import (batch_sharding, build_mesh, initialize_multihost,
                   replicate, replicated_sharding, shard_batch)

__all__ = [
    "batch_sharding",
    "build_mesh",
    "initialize_multihost",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
