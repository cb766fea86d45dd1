from . import comm
from .mesh import (
    DP_AXIS,
    batch_sharding,
    make_global_batch,
    make_mesh,
    pad_to_multiple,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "DP_AXIS", "batch_sharding", "comm", "make_global_batch", "make_mesh",
    "pad_to_multiple", "replicate_tree", "replicated", "shard_batch",
]
