"""Pipeline parallelism (GPipe over a ``pp`` mesh axis) — a TPU-first
capability beyond the reference's DP-family strategies (SURVEY.md §2.2).

Verifies: (1) the pipelined encoder matches the sequential stack exactly,
(2) gradients (and therefore darts/CG/Neumann hypergradients, which are
compositions of grads/HVPs) flow through the ppermute schedule correctly,
(3) a full bilevel engine program with a pipelined classifier matches the
sequential run step-for-step while keeping stage parameters sharded.

Runs on the 8-virtual-device CPU mesh (conftest.py)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.models import MetaWeightNet, make_pipelined_transformer
from betty_tpu.module import from_flax
from betty_tpu.parallel import make_mesh

CFG = dict(vocab_size=64, max_len=8, dim=16, depth=4, heads=2,
           num_classes=2, pad_id=1)


def _data(n=64, seed=0):
    r = np.random.RandomState(seed)
    ids = r.randint(2, CFG["vocab_size"], size=(n, CFG["max_len"]))
    ids[:, -2:] = 1  # some padding
    y = r.randint(0, 2, size=n)
    return jnp.asarray(ids, jnp.int32), jnp.asarray(y, jnp.int32)


def test_pipelined_forward_matches_sequential():
    mesh = make_mesh((("dp", 2), ("pp", 4)))
    seq_mod = make_pipelined_transformer(None, **CFG, rng=jax.random.PRNGKey(0))
    pp_mod = make_pipelined_transformer(mesh, **CFG, rng=jax.random.PRNGKey(0),
                                        num_microbatches=4)
    ids, _ = _data()
    vars_ = seq_mod.variables  # identical init (same rng)
    out_seq = seq_mod.apply(vars_, ids, train=False)
    out_pp = jax.jit(lambda v, i: pp_mod.apply(v, i, train=False))(vars_, ids)
    assert float(jnp.max(jnp.abs(out_seq - out_pp))) < 1e-5


def test_gradients_flow_through_pipeline():
    mesh = make_mesh((("dp", 2), ("pp", 4)))
    seq_mod = make_pipelined_transformer(None, **CFG, rng=jax.random.PRNGKey(0))
    pp_mod = make_pipelined_transformer(mesh, **CFG, rng=jax.random.PRNGKey(0),
                                        num_microbatches=4)
    ids, y = _data()
    vars_ = seq_mod.variables

    def loss(mod):
        def f(v):
            logits = mod.apply(v, ids, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        return f

    g_seq = jax.grad(loss(seq_mod))(vars_)
    g_pp = jax.jit(jax.grad(loss(pp_mod)))(vars_)
    err = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(g_seq),
                        jax.tree_util.tree_leaves(g_pp))
    )
    assert err < 1e-5, f"pipeline gradients diverge: {err}"


class Reweight(ImplicitProblem):
    def training_step(self, batch):
        ids, y = batch
        logits = self.classifier(ids)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        ids, y = batch
        logits = self.module(ids)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        w = self.reweight(jax.lax.stop_gradient(ce))
        return jnp.mean(w * ce)


def _run_engine(mesh, iters=3):
    ids, y = _data(64, seed=0)
    mids, my = _data(32, seed=1)
    module = make_pipelined_transformer(
        mesh, **CFG, rng=jax.random.PRNGKey(0), num_microbatches=4
    )
    mwn = from_flax(MetaWeightNet(), jnp.zeros((8,)),
                    rng=jax.random.PRNGKey(1), train_kwarg="train")
    clf = Classifier(
        "classifier", module=module, optimizer=optim.sgd(lr=0.05),
        train_data_loader=[(ids, y)],
        config=Config(
            type="darts", unroll_steps=2,
            shard_rules=((r"^blocks", ("pp",)),) if mesh is not None else None,
        ),
    )
    rw = Reweight(
        "reweight", module=mwn, optimizer=optim.adam(lr=1e-3),
        train_data_loader=[(mids, my)], config=Config(),
    )
    eng = Engine(
        config=EngineConfig(
            train_iters=iters,
            strategy="tp" if mesh is not None else "default",
            mesh_shape=(("dp", 2), ("pp", 4)) if mesh is not None else None,
        ),
        problems=[rw, clf],
        dependencies={"u2l": {rw: [clf]}, "l2u": {clf: [rw]}},
    )
    eng.run()
    return eng


@pytest.mark.slow
def test_bilevel_engine_with_pipelined_classifier():
    mesh = make_mesh((("dp", 2), ("pp", 4)))
    eng_pp = _run_engine(mesh)
    eng_seq = _run_engine(None)

    # stage parameters sharded over pp and still sharded after updates
    blocks = eng_pp.states["classifier"]["params"]["blocks"]
    leaf = jax.tree_util.tree_leaves(blocks)[0]
    assert leaf.sharding.shard_shape(leaf.shape)[0] == leaf.shape[0] // 4, (
        "pipeline stage parameters not sharded over pp"
    )

    # darts hypergradient THROUGH the pipeline == sequential engine run
    err = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(eng_pp.states["classifier"]["params"]),
            jax.tree_util.tree_leaves(eng_seq.states["classifier"]["params"]),
        )
    )
    err_rw = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(eng_pp.states["reweight"]["params"]),
            jax.tree_util.tree_leaves(eng_seq.states["reweight"]["params"]),
        )
    )
    assert err < 2e-5 and err_rw < 2e-5, (
        f"pipelined engine diverged: classifier {err}, reweight {err_rw}"
    )
