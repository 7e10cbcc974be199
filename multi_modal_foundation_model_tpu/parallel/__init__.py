from .mesh import (batch_sharding, build_mesh, initialize_multihost,
                   replicate, replicated_sharding, shard_batch)
from .partition import (model_axis_size, partition_rules, shard_tree,
                        spec_for, tree_shardings)

__all__ = [
    "batch_sharding",
    "build_mesh",
    "initialize_multihost",
    "model_axis_size",
    "partition_rules",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "shard_tree",
    "spec_for",
    "tree_shardings",
]
