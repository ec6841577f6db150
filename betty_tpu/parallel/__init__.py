from betty_tpu.parallel.mesh import (
    batch_sharding,
    fsdp_shardings,
    make_global_batch,
    make_mesh,
    maybe_init_distributed,
    replicated,
    shard_state,
    tp_shardings,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "fsdp_shardings",
    "tp_shardings",
    "shard_state",
    "make_global_batch",
    "maybe_init_distributed",
]
