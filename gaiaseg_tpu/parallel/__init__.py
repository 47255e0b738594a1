from .mesh import (DATA_AXIS, MODEL_AXIS, all_gather_objects,
                   batch_sharding, broadcast_object, initialize_distributed,
                   is_main_process, make_mesh, process_count, process_index,
                   replicate, replicated, shard_batch, shard_state, tp_spec)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding", "replicated",
    "shard_batch", "replicate", "broadcast_object", "all_gather_objects",
    "initialize_distributed", "is_main_process", "process_index",
    "process_count", "shard_state", "tp_spec",
]
