from .mesh import (
    DP_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "DP_AXIS", "batch_sharding", "make_mesh", "pad_to_multiple",
    "replicate_tree", "replicated", "shard_batch",
]
