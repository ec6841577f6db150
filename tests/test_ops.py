"""Pallas vector-op kernels: numeric equality with pure-XLA tree math
(interpret mode on CPU) and solver-level equivalence of the fused path."""

import jax
import jax.numpy as jnp
import numpy as np

from betty_tpu.ops import (
    cg_fused_step,
    fused_dot2,
    neumann_fused_step,
    tree_ravel,
    tree_unravel,
)
from betty_tpu.ops.vector import TILE


def rand_vec(n, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(n), jnp.float32)


def test_tree_ravel_roundtrip():
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "b": {"c": jnp.ones(5)}}
    flat, n = tree_ravel(tree)
    assert n == 11 and flat.shape[0] % TILE == 0
    back = tree_unravel(tree, flat)
    assert np.allclose(np.asarray(back["a"]), np.arange(6).reshape(2, 3))
    assert np.allclose(np.asarray(back["b"]["c"]), 1.0)


def test_fused_dot2():
    n = 2 * TILE
    a, b, c, d = (rand_vec(n, i) for i in range(4))
    ab, cd = fused_dot2(a, b, c, d)
    assert abs(float(ab) - float(jnp.vdot(a, b))) < 1e-2
    assert abs(float(cd) - float(jnp.vdot(c, d))) < 1e-2


def test_cg_fused_step():
    n = TILE
    x, p, r, hvp = (rand_vec(n, i) for i in range(4))
    ak = 0.37
    x2, r2, rr = cg_fused_step(ak, x, p, r, hvp)
    assert np.allclose(np.asarray(x2), np.asarray(x + ak * p), atol=1e-6)
    want_r = np.asarray(r - ak * hvp)
    assert np.allclose(np.asarray(r2), want_r, atol=1e-6)
    assert abs(float(rr) - float(np.vdot(want_r, want_r))) < 1e-2


def test_neumann_fused_step():
    n = TILE
    v, hv, p = (rand_vec(n, i) for i in range(3))
    v2, p2 = neumann_fused_step(0.5, v, hv, p)
    assert np.allclose(np.asarray(v2), np.asarray(v - 0.5 * hv), atol=1e-6)
    assert np.allclose(np.asarray(p2), np.asarray(p + v2), atol=1e-6)


def test_fused_solver_matches_tree_solver():
    """cg/neumann with use_fused_vector_ops=True produce the same
    hypergradients as the tree-math path."""
    from betty_tpu import Config, EngineConfig
    from fixtures import make_engine

    import copy

    for solver, extra in (
        ("cg", dict(cg_iterations=3, cg_alpha=0.5)),
        ("neumann", dict(neumann_iterations=3, neumann_alpha=0.5)),
    ):
        results = []
        for fused in (False, True):
            engine, outer, inner = make_engine(
                Config(type=solver, unroll_steps=5,
                       use_fused_vector_ops=fused, **extra),
                EngineConfig(train_iters=10),
            )
            engine.run()
            results.append(np.asarray(engine.states["outer"]["params"]["w"]))
        assert np.max(np.abs(results[0] - results[1])) < 1e-5, solver
