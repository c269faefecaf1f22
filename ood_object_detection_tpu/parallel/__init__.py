from .mesh import (
    all_gather_detections,
    create_mesh,
    data_sharding,
    is_main_process,
    local_shard,
    process_merge,
    reduce_dict,
    replicated,
    shard_batch,
    shared_random_seed,
)
