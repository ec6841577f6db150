"""DARTS / T1-T2 finite-difference solver.

Numerics match reference ``betty/hypergradient/darts.py:8-69`` exactly:

    eps    = darts_alpha / (||v|| + 1e-15)
    grad_p = d/d(prev) loss_curr(w + eps*v)
    grad_n = d/d(prev) loss_curr(w - eps*v)
    out    = (grad_n - grad_p) / (2*eps)

where ``w`` are curr's meta-trainable parameters, ``loss_curr`` is curr's
training loss on its own most recent batch, and the sign convention (negative
second-order correction) is built into the difference order.

The reference's FSDP special case — allreducing the squared norm across
shards (``darts.py:31-34``) — is unnecessary here: under pjit the norm of a
sharded pytree is already a global value. The ``darts_multitask`` parameter
persistence (``darts.py:61-63``, leaving the perturbation in place to
synchronize multitask replicas) is intentionally not replicated; see
``sama_multitask`` note in sama.py.
"""

import jax

from betty_tpu.utils import tree_axpy, tree_norm


def darts(vector, curr, prev, ctx, states, curr_batch, rng):
    from betty_tpu.problems.problem import ctx_replace

    config = curr.config
    R = config.darts_alpha
    eps = R / (tree_norm(vector) + 1e-15)

    def loss_at(curr_params, prev_params):
        c = ctx_replace(ctx, curr.name, curr_params)
        c = ctx_replace(c, prev.name, prev_params)
        loss, _, _ = curr.eval_loss(c, curr_batch, rng=rng)
        return loss

    w = ctx[curr.name]["params"]
    prev_p = ctx[prev.name]["params"]

    grad_fn = jax.grad(loss_at, argnums=1)
    grad_p = grad_fn(tree_axpy(eps, vector, w), prev_p)
    grad_n = grad_fn(tree_axpy(-eps, vector, w), prev_p)

    return jax.tree_util.tree_map(
        lambda n, p: (n - p) / (2.0 * eps), grad_n, grad_p
    )
