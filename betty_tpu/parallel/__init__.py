from betty_tpu.parallel.mesh import (
    batch_sharding,
    fsdp_shardings,
    make_mesh,
    replicated,
    shard_state,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "fsdp_shardings",
    "shard_state",
]
