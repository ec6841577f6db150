"""Pytree and logging utilities.

TPU-native counterpart of reference ``betty/utils.py``: the reference operates
on lists of ``torch.Tensor``; here every "vector" is a JAX pytree and the
helpers are pure functions safe under ``jax.jit``.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def tree_add(a, b):
    """a + b, leafwise. ``None``-tolerant on either side (treated as zero)."""
    if a is None:
        return b
    if b is None:
        return a
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(a, s):
    """s * a, leafwise (s scalar or traced scalar)."""
    return jax.tree_util.tree_map(lambda x: s * x, a)


def tree_axpy(alpha, x, y):
    """alpha * x + y, leafwise."""
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_dot(a, b):
    """Flattened dot product <vec(a), vec(b)> in float32.

    Counterpart of ``torch.dot(to_vec(a), to_vec(b))`` in the reference's CG
    solver (``betty/hypergradient/cg.py:45-47``).
    """
    # tree_map (not zip over leaves) so mismatched structures fail fast
    # instead of silently truncating the sum
    parts = jax.tree_util.tree_map(
        lambda x, y: jnp.vdot(
            x.astype(jnp.promote_types(x.dtype, jnp.float32)),
            y.astype(jnp.promote_types(y.dtype, jnp.float32)),
        ),
        a, b,
    )
    return sum(jax.tree_util.tree_leaves(parts))


def tree_norm(a):
    """Global L2 norm of a pytree, matching ``to_vec(v).norm()``
    (reference ``betty/hypergradient/darts.py:30``)."""
    return jnp.sqrt(tree_dot(a, a))


def to_vec(tree, alpha=1.0):
    """Flatten a pytree into one 1-D array (reference ``betty/utils.py:117``)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([(alpha * x).reshape(-1) for x in leaves])


def count_parameters(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def tree_cast(tree, dtype):
    """Cast all inexact leaves to ``dtype`` (used for bf16 compute policies)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def tree_where_mask(mask, a, b):
    """Select a where mask else b, leafwise. ``mask`` is a pytree of bools
    with the SAME structure as ``a``/``b`` (used for meta-trainable
    parameter filtering)."""
    return jax.tree_util.tree_map(lambda m, x, y: jnp.where(m, x, y), mask, a, b)


def clip_by_global_norm(tree, max_norm):
    """Gradient clipping with torch semantics
    (``torch.nn.utils.clip_grad_norm_``; see reference ``betty/problems/problem.py:627-636``):
    scale = max_norm / (norm + 1e-6), applied only when norm > max_norm.
    """
    norm = tree_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda x: x * scale.astype(x.dtype), tree)


def fold_rng_name(key, name: str):
    """Stable per-collection rng fold (crc32, not salted hash()) — shared by
    module init (from_flax) and per-step forward so init-time and step-time
    streams use the same naming scheme."""
    import zlib

    return jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)


def get_dtype(precision: str):
    if precision in ("fp16", "bf16"):
        # TPU-native half precision is bfloat16; fp16 maps to bf16 (no loss
        # scaling needed). Reference: betty/utils.py:10-16.
        return jnp.bfloat16
    return jnp.float32


def convert_scalar(value) -> Any:
    """Device scalar -> Python float for logging."""
    if isinstance(value, (jnp.ndarray, jax.Array)):
        try:
            return value.item()
        except Exception:  # non-scalar arrays pass through
            return np.asarray(value)
    if isinstance(value, np.generic):  # np.float32(...) etc. from np.mean
        return value.item()
    return value


def log_from_loss_dict(loss_dict) -> str:
    """Format a metrics dict for stdout logging
    (reference ``betty/utils.py:99-114``)."""
    outputs = []
    for key, values in loss_dict.items():
        if isinstance(values, (dict,)):
            for k2, v in values.items():
                outputs.append(f"{key}_{k2}: {convert_scalar(v)}")
        elif isinstance(values, (list, tuple)):
            for idx, v in enumerate(values):
                outputs.append(f"{key}_{idx}: {convert_scalar(v)}")
        else:
            outputs.append(f"{key}: {convert_scalar(values)}")
    return " || ".join(outputs)


def neg(tree):
    """Leafwise negation (reference ``neg_with_none``, ``betty/utils.py:125``;
    JAX pytrees have no ``None`` gradient leaves — unused inputs give zeros)."""
    return jax.tree_util.tree_map(jnp.negative, tree)
