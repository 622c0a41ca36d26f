from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_step,
    fsdp_sharding,
    shard_params_fsdp,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_step",
    "fsdp_sharding",
    "shard_params_fsdp",
]
