"""Pipeline parallelism (GPipe) over a ``pp`` mesh axis.

A TPU-first capability beyond the reference's DP-family strategies
(SURVEY.md §2.2: tensor/pipeline parallelism absent upstream). The repeated
block stack of a model is partitioned into S = mesh.shape["pp"] stages; the
batch is split into M microbatches that flow through the stages with
``jax.lax.ppermute`` ring transfers inside a ``lax.scan`` schedule (the
GPipe fill/drain schedule, arXiv:1811.06965 — M + S - 1 scan steps, bubble
fraction (S-1)/(M+S-1)).

Everything is expressed with differentiable primitives (scan / ppermute /
psum), so ``jax.grad`` — and therefore every betty_tpu hypergradient solver
(darts/sama perturbed forwards, CG/Neumann HVPs, ITD unroll replay) — flows
through the pipeline unchanged.

Stage parameters live as STACKED leaves with a leading ``depth`` axis;
shard that axis over ``pp`` (``Config.shard_rules=((r"^blocks", ("pp",)),)``
under ``strategy="tp"``) and each device materializes only its own stage's
blocks.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    _REPLICATION_KW = "check_vma"
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

    _REPLICATION_KW = "check_rep"  # pre-0.8 spelling


def stack_block_params(block_init: Callable, rng, depth: int):
    """Initialize ``depth`` independent copies of a block's parameters as one
    stacked pytree with a leading depth axis (per-block RNG folds)."""
    keys = jax.random.split(rng, depth)
    return jax.vmap(block_init)(keys)


def gpipe(
    block_apply: Callable,
    stacked_params,
    x,
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: Optional[int] = None,
):
    """Run a stack of blocks as a GPipe pipeline over ``mesh[axis]``.

    ``block_apply(params_i, x) -> x`` applies ONE block; ``x`` is a pytree
    whose leaves all have a leading batch dimension (e.g. ``(hidden, mask)``
    — leaves a block does not modify simply pass through). ``stacked_params``
    leaves carry a leading ``depth`` axis, ``depth % S == 0``; the batch must
    divide ``num_microbatches`` (default S).

    Returns the pytree after all ``depth`` blocks, replicated over ``axis``.
    """
    S = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(x)
    B = leaves[0].shape[0]
    M = num_microbatches or S
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if depth % S != 0:
        raise ValueError(f"depth {depth} not divisible by {S} pipeline stages")
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M

    x_mb = jax.tree_util.tree_map(
        lambda a: a.reshape((M, mb) + a.shape[1:]), x
    )

    param_specs = jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked_params
    )
    # Compose with data parallelism: when the mesh has a "dp" axis, each dp
    # row pipelines only its shard of every microbatch (the pp ring runs
    # within the row); otherwise the batch is replicated over non-pp axes.
    dp = "dp" if ("dp" in mesh.shape and mesh.shape["dp"] > 1
                  and mb % mesh.shape["dp"] == 0) else None
    x_specs = jax.tree_util.tree_map(
        lambda a: P(None, dp, *([None] * (a.ndim - 2))), x_mb
    )

    def stage_fn(params_local, x_mb):
        # params_local leaves: [depth/S, ...]; x_mb leaves: [M, mb, ...]
        idx = jax.lax.axis_index(axis)
        T = M + S - 1

        def apply_local(h):
            def body(h, p_i):
                return block_apply(p_i, h), None

            h, _ = jax.lax.scan(body, h, params_local)
            return h

        def step(carry, t):
            mb_idx = jnp.clip(t, 0, M - 1)
            first = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, mb_idx, axis=0, keepdims=False
                ),
                x_mb,
            )
            inp = jax.tree_util.tree_map(
                lambda f, r: jnp.where(idx == 0, f, r), first, carry
            )
            out = apply_local(inp)
            nxt = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return nxt, out

        zero = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), x_mb
        )
        _, outs = jax.lax.scan(step, zero, jnp.arange(T))
        # the LAST stage holds microbatch m's final output at step m + S - 1
        y_local = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, S - 1, M, axis=0), outs
        )
        # replicate the result: zero everywhere but the last stage, then psum
        y = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(
                jnp.where(idx == S - 1, a, jnp.zeros_like(a)), axis
            ),
            y_local,
        )
        return y

    out_specs = jax.tree_util.tree_map(
        lambda a: P(None, dp, *([None] * (a.ndim - 2))), x_mb
    )
    y_mb = _shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(param_specs, x_specs),
        out_specs=out_specs,
        **{_REPLICATION_KW: False},
    )(stacked_params, x_mb)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((B,) + a.shape[2:]), y_mb
    )


def sequential(block_apply: Callable, stacked_params, x):
    """Reference semantics of :func:`gpipe`: the same stacked blocks applied
    sequentially on one device (used for parity tests and single-device
    runs)."""

    def body(h, p_i):
        return block_apply(p_i, h), None

    out, _ = jax.lax.scan(body, x, stacked_params)
    return out
