"""Hessian-vector products for the iterative solvers (CG / Neumann).

The reference computes HVPs as reverse-over-reverse:
``torch.autograd.grad(in_grad, params, grad_outputs=v)``
(``betty/hypergradient/cg.py:39-41``, ``neumann.py:59-66``). On TPU,
forward-over-reverse (``jax.jvp`` of the gradient function) computes the
same ``H v`` — the Hessian of a scalar loss is symmetric — with a cheaper
program: the tangent is carried alongside the existing forward+backward
instead of differentiating the backward graph a second time. Both modes are
exposed via ``Config.hvp_mode``; numerics agree to rounding
(tests/test_solver_golden.py runs the golden parity suite in both modes).
"""

import jax


def make_hvp(g_fn, w0, mode: str = "jvp"):
    """Return ``hvp(p) -> H @ p`` for the gradient function ``g_fn`` at
    ``w0``. ``mode``: "jvp" (forward-over-reverse, default) or "vjp"
    (reverse-over-reverse, the reference's literal construction)."""
    if mode == "jvp":
        # linearize once: the primal forward+backward of g_fn is traced a
        # single time and each hvp call only evaluates the tangent program
        # (cg/neumann call this iterations-many times in an unrolled loop)
        _, jvp_fn = jax.linearize(g_fn, w0)
        return jvp_fn
    if mode == "vjp":
        _, vjp_fn = jax.vjp(g_fn, w0)

        def hvp(p):
            return vjp_fn(p)[0]

        return hvp
    raise ValueError(f"hvp_mode must be 'jvp' or 'vjp', got {mode!r}")
