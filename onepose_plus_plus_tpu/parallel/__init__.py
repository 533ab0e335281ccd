from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    all_gather_metrics,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "all_gather_metrics",
]
from .comm import (
    world_size,
    rank,
    is_main_process,
    all_gather_arrays,
    all_gather_objects,
    gather_metrics,
)
