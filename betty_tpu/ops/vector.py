"""Pallas TPU kernels for the hypergradient solvers' vector algebra.

The CG and Neumann inner loops (betty_tpu/hypergradient/{cg,neumann}.py) are
HBM-bandwidth-bound between HVP evaluations: each iteration reads/writes the
full parameter-sized vectors several times (dots, axpys). These kernels fuse
one iteration's elementwise updates *and* the reductions the next step needs
into a single pass over memory:

* ``fused_dot2``          — <a,b> and <c,d> in one read of four vectors
* ``cg_fused_step``       — x' = x + ak*p, r' = r - ak*hvp, plus <r',r'>
                            in one pass (classic CG fused update)
* ``neumann_fused_step``  — v' = v - alpha*hv, p' = p + v' in one pass

Vectors are the *flattened* parameter pytree (``tree_ravel``); on models
with hundreds of parameter leaves this additionally replaces hundreds of
small elementwise kernels per iteration with one large tiled one.

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
Enable in solvers with ``Config(use_fused_vector_ops=True)``; betty_tpu
falls back to pure-XLA tree math otherwise (identical numerics either way,
asserted in tests/test_ops.py).

MEASURED VERDICT (v5e, 25M-param MLP, CG(10) — bench.py fused_vector_ops):
the kernels win microbenchmarks (fused_dot2 0.037 ms vs 0.057 ms XLA on a
25M vector) but LOSE in-context (the jitted CG solve runs ~2.7x slower
with kernels enabled): XLA already fuses the solver's vector algebra into
the HVP pipeline, and an opaque Mosaic call in the middle blocks that
fusion. Hence the flag defaults to OFF; the kernels remain available and
numerically verified for runtimes where the trade differs.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
TILE = 8 * 1024  # elements per grid step (aligned: 64 sublane rows)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# pytree <-> flat vector
# ---------------------------------------------------------------------------


def tree_ravel(tree):
    """Flatten to one fp32 vector padded to a TILE multiple."""
    leaves = jax.tree_util.tree_leaves(tree)
    flat = jnp.concatenate([x.reshape(-1).astype(jnp.float32) for x in leaves])
    n = flat.shape[0]
    padded = -(-n // TILE) * TILE
    if padded != n:
        flat = jnp.pad(flat, (0, padded - n))
    return flat, n


def tree_unravel(tree, flat):
    """Inverse of tree_ravel against a template pytree."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    offset = 0
    for x in leaves:
        size = int(np.prod(x.shape)) if x.shape else 1
        out.append(flat[offset : offset + size].reshape(x.shape).astype(x.dtype))
        offset += size
    return jax.tree_util.tree_unflatten(treedef, out)


def flatten_like(template):
    """Returns (ravel_fn, unravel_fn) pair for a pytree template."""
    return (lambda t: tree_ravel(t)), (lambda f: tree_unravel(template, f))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _dot2_kernel(a_ref, b_ref, c_ref, d_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)
        out_ref[0, 1] = jnp.float32(0.0)

    out_ref[0, 0] += jnp.sum(a_ref[:] * b_ref[:])
    out_ref[0, 1] += jnp.sum(c_ref[:] * d_ref[:])


def fused_dot2(a, b, c, d):
    """(<a,b>, <c,d>) in one pass. Inputs: equal-length fp32 vectors whose
    length is a multiple of TILE (from tree_ravel)."""
    n = a.shape[0]
    grid = n // TILE
    shape2d = (TILE // LANE, LANE)
    vec_spec = pl.BlockSpec(
        shape2d, lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _dot2_kernel,
        grid=(grid,),
        in_specs=[vec_spec] * 4,
        out_specs=pl.BlockSpec(
            (1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        interpret=_interpret(),
    )(*(x.reshape(-1, LANE) for x in (a, b, c, d)))
    return out[0, 0], out[0, 1]


def _cg_step_kernel(ak_ref, x_ref, p_ref, r_ref, hvp_ref,
                    x_out, r_out, rr_out):
    i = pl.program_id(0)
    ak = ak_ref[0, 0]

    @pl.when(i == 0)
    def _():
        rr_out[0, 0] = jnp.float32(0.0)

    x_out[:] = x_ref[:] + ak * p_ref[:]
    r_new = r_ref[:] - ak * hvp_ref[:]
    r_out[:] = r_new
    rr_out[0, 0] += jnp.sum(r_new * r_new)


def cg_fused_step(ak, x, p, r, hvp):
    """One CG vector update in a single memory pass:
    x' = x + ak*p ; r' = r - ak*hvp ; returns (x', r', <r',r'>)."""
    n = x.shape[0]
    grid = n // TILE
    shape2d = (TILE // LANE, LANE)
    vec_spec = pl.BlockSpec(shape2d, lambda i: (i, 0), memory_space=pltpu.VMEM)
    ak2d = jnp.asarray(ak, jnp.float32).reshape(1, 1)
    x2, r2, rr = pl.pallas_call(
        _cg_step_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vec_spec, vec_spec, vec_spec, vec_spec,
        ],
        out_specs=(
            vec_spec, vec_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n // LANE, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n // LANE, LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(ak2d, *(v.reshape(-1, LANE) for v in (x, p, r, hvp)))
    return x2.reshape(-1), r2.reshape(-1), rr[0, 0]


def _neumann_step_kernel(alpha_ref, v_ref, hv_ref, p_ref, v_out, p_out):
    alpha = alpha_ref[0, 0]
    v_new = v_ref[:] - alpha * hv_ref[:]
    v_out[:] = v_new
    p_out[:] = p_ref[:] + v_new


def neumann_fused_step(alpha, v, hv, p):
    """One Neumann-series update in a single pass:
    v' = v - alpha*hv ; p' = p + v'."""
    n = v.shape[0]
    grid = n // TILE
    shape2d = (TILE // LANE, LANE)
    vec_spec = pl.BlockSpec(shape2d, lambda i: (i, 0), memory_space=pltpu.VMEM)
    alpha2d = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    v2, p2 = pl.pallas_call(
        _neumann_step_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vec_spec, vec_spec, vec_spec,
        ],
        out_specs=(vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n // LANE, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n // LANE, LANE), jnp.float32),
        ),
        interpret=_interpret(),
    )(alpha2d, *(x.reshape(-1, LANE) for x in (v, hv, p)))
    return v2.reshape(-1), p2.reshape(-1)
