"""Best-response-Jacobian solvers (hypergradients).

Counterpart of reference ``betty/hypergradient/__init__.py``: chains
matrix-vector products along each backprop path
``[upper, mid_k, ..., mid_1, upper]`` (reference ``engine.py:232-264`` path
orientation). The chain starts with the direct gradient of the upper loss
w.r.t. ``path[1]``'s meta-trainable parameters, then applies one solver per
edge ``(curr=path[i], prev=path[i+1])``.

TPU notes:

* The reference's ``do_sync`` flag — routing the final segment through
  ``autograd.backward`` so DDP allreduce hooks fire
  (``hypergradient/__init__.py:36-37``) — has no counterpart: gradients of a
  loss over a mesh-sharded batch are globally reduced by XLA automatically.
* Everything here is pure and jit-traceable; solvers receive the immutable
  trace context instead of perturbing live parameters in place.
"""

from betty_tpu.utils import tree_add

from .darts import darts
from .sama import sama
from .neumann import neumann
from .cg import cg
from .reinforce import reinforce

jvp_fn_mapping = {
    "darts": darts,
    "sama": sama,
    "neumann": neumann,
    "cg": cg,
    "reinforce": reinforce,
}


def register_solver(name: str, fn):
    """Extension point: drop-in custom solvers, mirroring the reference's
    documented ``jvp_fn_mapping`` registration."""
    jvp_fn_mapping[name] = fn


def compute_path_grads(problem, ctx, states, batch, path_batches, rng, gas,
                       v_by_child=None):
    """Sum of hypergradient contributions over all of ``problem``'s paths
    (reference ``problem.py:572-581`` + ``hypergradient/__init__.py:22-39``).

    ``v_by_child``: per-child starting vectors already computed by the
    caller's joint backward pass (one backward serves the direct gradient
    and every path's v); None = compute here (the bf16-training +
    fp32-solver precision split needs the separate fp32 evaluation).

    Returns a gradient pytree matching ``problem``'s params.
    """
    import jax

    from betty_tpu.problems.problem import ctx_replace, force_fp32

    total = None
    for path in problem.paths:
        child = path[1]

        if v_by_child is not None:
            v = v_by_child[child.name]
        else:
            def child_loss(child_params, _child=child):
                c = ctx_replace(ctx, _child.name, child_params)
                loss, _, _ = problem.eval_loss(c, batch, rng=rng)
                return loss / gas

            # solver_precision="fp32": the whole hypergradient pipeline
            # (direct cross-gradient + each solver edge) runs without the
            # bf16 cast — central differences and HVPs are noise-dominated
            # in bf16 (tests/test_bf16.py measures the difference)
            with force_fp32(problem.config.solver_precision == "fp32"):
                v = jax.grad(child_loss)(ctx[child.name]["params"])
        v = child.meta_filter_grad(v)

        for i in range(1, len(path) - 1):
            curr, prev = path[i], path[i + 1]
            solver_name = curr.config.type
            assert solver_name in jvp_fn_mapping, (
                f"Unknown hypergradient solver {solver_name!r}"
            )
            jvp_fn = jvp_fn_mapping[solver_name]
            with force_fp32(curr.config.solver_precision == "fp32"):
                v = jvp_fn(
                    v, curr, prev, ctx, states, path_batches[curr.name], rng
                )

        total = tree_add(total, v)
    return total
