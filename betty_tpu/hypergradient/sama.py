"""SAMA solver (NeurIPS'23 "Making Scalable Meta Learning Practical").

Numerics match reference ``betty/hypergradient/sama.py:7-61`` +
``betty/hypergradient/utils.py:37-63``: the incoming vector is preconditioned
by the curvature of curr's Adam update (reconstructed from the *post-step*
moments ``mu``/``nu`` and the cached ``last_grad``), then a darts-style
central difference with ``R = sama_adam_alpha`` produces the
best-response-Jacobian product.

On TPU the expensive part — two extra forward/backward passes — runs inside
the same jitted program as the rest of the meta step, and the cross-replica
gradient reduction the SAMA paper adds by hand arrives for free from XLA when
the batch is mesh-sharded. ``sama_multitask``'s in-place parameter allreduce
(``sama.py:55``) is intentionally not replicated: replicated params under
pjit never diverge, so there is nothing to re-synchronize.
"""

import jax
import jax.numpy as jnp

from betty_tpu.utils import tree_axpy, tree_norm


def precondition(vector, curr, curr_state):
    """Optimizer-aware preconditioning (reference
    ``hypergradient/utils.py:87-92`` dispatch; sgd = identity, adam below)."""
    kind = curr.optimizer.kind if curr.optimizer is not None else "sgd"
    if kind == "sgd" or kind == "custom":
        return vector
    if kind == "adam":
        return precondition_adam(vector, curr, curr_state)
    raise NotImplementedError(
        f"SAMA preconditioning for {kind} is not implemented!"
    )


def precondition_adam(vector, curr, curr_state):
    """Reconstruct the pre-step Adam moments from the cached last gradient
    and scale the vector by the local curvature of the Adam update
    (reference ``hypergradient/utils.py:37-63``)."""
    opt = curr.optimizer
    mu, nu = opt.adam_moments(curr_state["opt_state"])
    last_grad = curr_state.get("last_grad")
    assert last_grad is not None, (
        "SAMA requires last_grad state; is curr's config.type == 'sama'?"
    )

    if getattr(opt, "group_meta", None) is not None:
        # param_groups: per-leaf lr/betas/eps, exactly the reference's
        # per-param_group reads (utils.py:45-61)
        lr_tree, b1_tree, b2_tree, eps_tree = opt.leaf_hyperparam_trees(
            curr_state["sched_step"]
        )
    else:
        beta1, beta2 = opt.betas
        if opt.schedule is not None:
            lr = opt.schedule(curr_state["sched_step"])
        else:
            lr = opt.lr
        const = lambda v: jax.tree_util.tree_map(lambda _: v, mu)  # noqa: E731
        lr_tree, b1_tree, b2_tree = const(lr), const(beta1), const(beta2)
        eps_tree = const(opt.eps)

    def precond_leaf(v, m, n, lg, lr, b1, b2, eps):
        exp_avg_old = (m - (1 - b1) * lg) / b1 if b1 != 0 else 0.0
        exp_avg_sq_old = (n - (1 - b2) * lg * lg) / b2
        scale = (1 - b1) * b2 * exp_avg_sq_old - b1 * (1 - b2) * lg * exp_avg_old
        scale = scale / (jnp.sqrt(n) + eps) ** 3
        return v * scale * lr

    return jax.tree_util.tree_map(
        precond_leaf, vector, mu, nu, last_grad,
        lr_tree, b1_tree, b2_tree, eps_tree,
    )


def sama(vector, curr, prev, ctx, states, curr_batch, rng):
    from betty_tpu.problems.problem import ctx_replace

    config = curr.config
    R = config.sama_adam_alpha

    vector = precondition(vector, curr, states[curr.name])
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
