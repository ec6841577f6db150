from betty_tpu.ops.vector import (
    cg_fused_step,
    flatten_like,
    fused_dot2,
    neumann_fused_step,
    tree_ravel,
    tree_unravel,
)

__all__ = [
    "tree_ravel",
    "tree_unravel",
    "flatten_like",
    "fused_dot2",
    "cg_fused_step",
    "neumann_fused_step",
]
