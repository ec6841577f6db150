"""Sequence parallelism: activations sharding-constrained on the sequence
dimension between encoder blocks (Megatron-SP layout) — absent in the
reference. Numerics must match the unsharded module; the compiled HLO must
actually partition over sp (8-virtual-device CPU mesh, conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from betty_tpu.models import make_pipelined_transformer
from betty_tpu.parallel import make_mesh

CFG = dict(vocab_size=64, max_len=8, dim=16, depth=2, heads=2,
           num_classes=2, pad_id=1)


def test_sequence_parallel_matches_unsharded():
    mesh = make_mesh((("dp", 2), ("sp", 4)))
    seq_mod = make_pipelined_transformer(None, **CFG, rng=jax.random.PRNGKey(0))
    sp_mod = make_pipelined_transformer(mesh, **CFG, rng=jax.random.PRNGKey(0),
                                        seq_axis="sp")
    r = np.random.RandomState(0)
    ids = jnp.asarray(r.randint(2, 64, size=(16, 8)), jnp.int32)
    vars_ = seq_mod.variables
    out_ref = seq_mod.apply(vars_, ids, train=False)
    f = jax.jit(lambda v, i: sp_mod.apply(v, i, train=False))
    out_sp = f(vars_, ids)
    assert float(jnp.max(jnp.abs(out_ref - out_sp))) < 1e-5

    # compiled program really partitions: activation-sized all-gathers or
    # collective-permutes appear for the attention gathers
    hlo = f.lower(vars_, ids).compile().as_text()
    assert ("all-gather" in hlo) or ("all-to-all" in hlo) or (
        "collective-permute" in hlo
    ), "sequence-parallel constraint compiled away without collectives"


def test_sequence_parallel_gradients():
    mesh = make_mesh((("dp", 2), ("sp", 4)))
    seq_mod = make_pipelined_transformer(None, **CFG, rng=jax.random.PRNGKey(0))
    sp_mod = make_pipelined_transformer(mesh, **CFG, rng=jax.random.PRNGKey(0),
                                        seq_axis="sp")
    r = np.random.RandomState(0)
    ids = jnp.asarray(r.randint(2, 64, size=(16, 8)), jnp.int32)
    vars_ = seq_mod.variables

    def loss(mod):
        return lambda v: jnp.sum(mod.apply(v, ids, train=False) ** 2)

    g_ref = jax.grad(loss(seq_mod))(vars_)
    g_sp = jax.jit(jax.grad(loss(sp_mod)))(vars_)
    err = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_sp))
    )
    assert err < 2e-4, f"sp gradients diverge: {err}"
