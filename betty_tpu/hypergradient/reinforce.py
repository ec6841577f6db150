"""REINFORCE (score-function / evolution-strategies) hypergradient solver.

The reference registers a ``reinforce`` solver but its body is an
unfinished stub (``betty/hypergradient/reinforce.py:6-25`` — the function
ends after reading the config), so there are no reference semantics to
match. betty_tpu implements the solver the name promises: a **zeroth-order
estimate of the same cross-derivative darts computes**, usable when the
lower-level loss is NOT differentiable with respect to the upper problem's
parameters (discrete decisions, sampling, quantization, black-box
simulators — classic REINFORCE territory).

darts (``darts.py``) computes

    out = [grad_prev loss(w - eps*v) - grad_prev loss(w + eps*v)] / (2*eps)

with ``grad_prev`` taken by reverse-mode AD. Here ``grad_prev`` is replaced
by the antithetic Gaussian-smoothed score-function estimator

    E_hat[grad_prev loss(w', p)] =
        1/n * sum_i  u_i * [loss(w', p + sigma*u_i)
                            - loss(w', p - sigma*u_i)] / (2*sigma),
    u_i ~ N(0, I)

which is the exact gradient of the Gaussian-smoothed loss
``E_u[loss(w', p + sigma*u)]`` — no differentiability in ``p`` required.
The same directions ``u_i`` are used at ``w + eps*v`` and ``w - eps*v``
(common random numbers), so the outer central difference cancels the
per-direction noise shared by both sides and the estimator converges to
darts' value as ``sigma -> 0``, ``n -> inf`` on smooth losses
(tests/test_reinforce.py measures this).

Cost: ``4 * reinforce_samples`` loss evaluations per edge, run as a
``lax.scan`` over sample pairs (sequential — each carries a full forward;
batching them would multiply peak activation memory by ``n``).
"""

import jax
import jax.numpy as jnp

from betty_tpu.utils import tree_axpy, tree_norm


def reinforce(vector, curr, prev, ctx, states, curr_batch, rng):
    from betty_tpu.problems.problem import ctx_replace

    config = curr.config
    n = config.reinforce_samples
    sigma = config.reinforce_sigma
    eps = config.reinforce_alpha / (tree_norm(vector) + 1e-15)

    def loss_at(curr_params, prev_params):
        c = ctx_replace(ctx, curr.name, curr_params)
        c = ctx_replace(c, prev.name, prev_params)
        loss, _, _ = curr.eval_loss(c, curr_batch, rng=rng)
        return loss

    w = ctx[curr.name]["params"]
    prev_p = ctx[prev.name]["params"]
    w_plus = tree_axpy(eps, vector, w)
    w_minus = tree_axpy(-eps, vector, w)

    leaves, treedef = jax.tree_util.tree_flatten(prev_p)

    def sample_step(acc, key):
        keys = jax.random.split(key, len(leaves))
        u = jax.tree_util.tree_unflatten(
            treedef,
            [jax.random.normal(k, l.shape, l.dtype)
             for k, l in zip(keys, leaves)],
        )
        p_plus = tree_axpy(sigma, u, prev_p)
        p_minus = tree_axpy(-sigma, u, prev_p)
        # antithetic score estimate of grad_prev at each w-perturbation,
        # collapsed to one scalar coefficient on u (common random numbers)
        d_minus = loss_at(w_minus, p_plus) - loss_at(w_minus, p_minus)
        d_plus = loss_at(w_plus, p_plus) - loss_at(w_plus, p_minus)
        coef = (d_minus - d_plus) / (2.0 * sigma * 2.0 * eps * n)
        acc = jax.tree_util.tree_map(
            lambda a, ui: a + coef.astype(a.dtype) * ui, acc, u
        )
        return acc, None

    zero = jax.tree_util.tree_map(jnp.zeros_like, prev_p)
    sample_keys = jax.random.split(jax.random.fold_in(rng, 0x5E1F), n)
    out, _ = jax.lax.scan(sample_step, zero, sample_keys)
    return out
