from .mesh import (
    all_gather_detections,
    create_mesh,
    data_sharding,
    process_merge,
    replicated,
    shard_batch,
)
