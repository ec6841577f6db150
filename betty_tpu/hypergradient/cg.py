"""Conjugate-gradient (iMAML-style) implicit-differentiation solver.

Numerics match reference ``betty/hypergradient/cg.py:8-70`` exactly,
*including its idiosyncratic scaling*: the step size denominator uses the
``cg_alpha``-scaled HVP (``to_vec(hvp, alpha=cg_alpha)``, ``cg.py:43``) while
the residual update uses the raw HVP (``cg.py:51``), and the final solution
is multiplied by ``cg_alpha`` once more (``cg.py:56``). That quirk is
load-bearing for numerical parity with the reference, so it is reproduced
verbatim rather than "fixed" into textbook CG on (alpha*H).
Bilevel-only, like the reference (assert at ``cg.py:25``).
"""

import jax
import jax.numpy as jnp

from betty_tpu.hypergradient.hvp import make_hvp
from betty_tpu.utils import neg, tree_axpy, tree_dot, tree_scale, tree_zeros_like


def cg(vector, curr, prev, ctx, states, curr_batch, rng):
    from betty_tpu.problems.problem import ctx_replace

    assert len(curr.paths) == 0, "cg method is not supported for higher-order MLO!"
    config = curr.config
    alpha_s = config.cg_alpha

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
        x = _cg_loop_fused(vector, hvp_fn, config)
    else:
        x = tree_zeros_like(vector)
        r = vector
        p = vector
        for _ in range(config.cg_iterations):
            hvp = hvp_fn(p)
            numerator = tree_dot(r, r)
            denominator = alpha_s * tree_dot(hvp, p)
            ak = numerator / denominator

            x = tree_axpy(ak, p, x)
            r_new = tree_axpy(-ak, hvp, r)
            beta = tree_dot(r_new, r_new) / numerator
            p = tree_axpy(beta, p, r_new)
            r = r_new
    x = tree_scale(x, alpha_s)

    _, vjp_prev = jax.vjp(lambda pp: g_fn(w0, pp), prev0)
    (cross,) = vjp_prev(x)
    return neg(cross)


def _cg_loop_fused(vector, hvp_fn, config):
    """Same recurrence via fused Pallas vector kernels over the flattened
    parameter vector (betty_tpu/ops/vector.py). Bitwise-equal math; one
    memory pass for {x,r,<r',r'>} per iteration instead of several, and one
    large tiled kernel instead of per-leaf kernels."""
    from betty_tpu.ops import cg_fused_step, fused_dot2, tree_ravel, tree_unravel

    alpha_s = config.cg_alpha
    flat_v, _ = tree_ravel(vector)
    x = jnp.zeros_like(flat_v)
    r = flat_v
    p = flat_v
    rr = None
    for it in range(config.cg_iterations):
        hvp_tree = hvp_fn(tree_unravel(vector, p))
        hvp, _ = tree_ravel(hvp_tree)
        if rr is None:
            rr, hp = fused_dot2(r, r, hvp, p)  # one pass for both dots
        else:
            hp = jnp.dot(hvp, p)  # rr carried from the previous iteration
        ak = rr / (alpha_s * hp)
        x, r_new, rr_new = cg_fused_step(ak, x, p, r, hvp)
        beta = rr_new / rr
        p = r_new + beta * p
        r, rr = r_new, rr_new
    return tree_unravel(vector, x)
