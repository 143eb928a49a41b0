from yolox_tpu.parallel.mesh import (
    all_gather_objects,
    data_parallel_mesh,
    process_count,
    process_index,
    shard_batch,
)

__all__ = [
    "all_gather_objects",
    "data_parallel_mesh",
    "process_count",
    "process_index",
    "shard_batch",
]
