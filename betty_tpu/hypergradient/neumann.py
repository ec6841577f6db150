"""Neumann-series inverse-Hessian-vector-product solver.

Numerics match reference ``betty/hypergradient/neumann.py:8-66``:

    g      = d loss_curr / d w                        (curr's own batch)
    p = v;  repeat k times: v <- v - alpha * H v;  p <- p + v
    v2     = alpha * p
    out    = - (d g / d prev)^T v2                    (mixed second derivative)

HVPs default to forward-over-reverse (``Config.hvp_mode="jvp"`` — see
betty_tpu/hypergradient/hvp.py; the reference's reverse-over-reverse
construction is available as ``hvp_mode="vjp"``). Bilevel-only, like the
reference (assert at ``neumann.py:29``).
"""

import jax

from betty_tpu.hypergradient.hvp import make_hvp
from betty_tpu.utils import neg, tree_add, tree_axpy, tree_scale


def neumann(vector, curr, prev, ctx, states, curr_batch, rng):
    from betty_tpu.problems.problem import ctx_replace

    assert len(curr.paths) == 0, (
        "neumann method is not supported for higher-order MLO!"
    )
    config = curr.config
    alpha = config.neumann_alpha

    def in_loss(curr_params, prev_params):
        c = ctx_replace(ctx, curr.name, curr_params)
        c = ctx_replace(c, prev.name, prev_params)
        loss, _, _ = curr.eval_loss(c, curr_batch, rng=rng)
        return loss

    w0 = ctx[curr.name]["params"]
    prev0 = ctx[prev.name]["params"]
    g_fn = jax.grad(in_loss, argnums=0)

    hvp_fn = make_hvp(lambda cp: g_fn(cp, prev0), w0, config.hvp_mode)

    if config.use_fused_vector_ops:
        from betty_tpu.ops import neumann_fused_step, tree_ravel, tree_unravel

        v_flat, _ = tree_ravel(vector)
        p_flat = v_flat
        for _ in range(config.neumann_iterations):
            hv_tree = hvp_fn(tree_unravel(vector, v_flat))
            hv_flat, _ = tree_ravel(hv_tree)
            v_flat, p_flat = neumann_fused_step(alpha, v_flat, hv_flat, p_flat)
        v2 = tree_unravel(vector, alpha * p_flat)
    else:
        v = vector
        p = vector
        for _ in range(config.neumann_iterations):
            hv = hvp_fn(v)
            v = tree_axpy(-alpha, hv, v)
            p = tree_add(p, v)
        v2 = tree_scale(p, alpha)

    # cross term: (d g / d prev)^T v2
    _, vjp_prev = jax.vjp(lambda pp: g_fn(w0, pp), prev0)
    (cross,) = vjp_prev(v2)
    return neg(cross)
