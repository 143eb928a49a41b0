from yolox_tpu.parallel.mesh import (
    data_parallel_mesh,
    process_count,
    process_index,
    shard_batch,
)

__all__ = [
    "data_parallel_mesh",
    "process_count",
    "process_index",
    "shard_batch",
]
