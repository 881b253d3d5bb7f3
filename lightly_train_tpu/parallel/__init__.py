from lightly_train_tpu.parallel.distributed import (
    get_process_count,
    get_process_index,
    initialize_distributed,
    is_main_process,
)
from lightly_train_tpu.parallel.mesh import (
    BATCH_AXIS,
    MeshConfig,
    batch_sharding,
    get_default_mesh,
    replicated_sharding,
    shard_batch,
    shard_train_state,
)

__all__ = [
    "BATCH_AXIS",
    "MeshConfig",
    "batch_sharding",
    "get_default_mesh",
    "get_process_count",
    "get_process_index",
    "initialize_distributed",
    "is_main_process",
    "replicated_sharding",
    "shard_batch",
    "shard_train_state",
]
