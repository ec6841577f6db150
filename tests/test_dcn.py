"""Multi-slice (DCN) topology: a ``dcn`` mesh axis in front of ``dp``.

VERDICT r2 #7 / SURVEY §5.8: the batch shards over ("dcn", "dp") — the only
tensor that crosses slices — so gradient and hypergradient all-reduces
decompose hierarchically (ICI reduction within a slice, one DCN reduction
across slices), while FSDP parameter gathers stay on the intra-slice ``dp``
axis. Verified: numeric parity with the single-device run, and the compiled
update's HLO contains all-reduces whose replica groups span the dcn axis.

8-virtual-device CPU mesh (conftest.py) standing in for 2 slices x 4 chips.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.models import MLP, MetaWeightNet
from betty_tpu.module import from_flax
from betty_tpu.parallel import batch_sharding, make_mesh

DIM = 16


def _data(n, seed):
    r = np.random.RandomState(seed)
    return (jnp.asarray(r.randn(n, DIM), jnp.float32),
            jnp.asarray(r.randint(0, 2, n), jnp.int32))


class Reweight(ImplicitProblem):
    def training_step(self, batch):
        x, y = batch
        logits = self.classifier(x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        x, y = batch
        logits = self.module(x)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        w = self.reweight(jax.lax.stop_gradient(ce))
        return jnp.mean(w * ce)


def _run(strategy, mesh_shape, iters=4, **cfg):
    x, y = _data(64, 0)
    xv, yv = _data(32, 1)
    clf = Classifier(
        "classifier",
        module=from_flax(MLP(features=[32, 2]), jnp.zeros((8, DIM)),
                         rng=jax.random.PRNGKey(0)),
        optimizer=optim.sgd(lr=0.05),
        train_data_loader=[(x, y)],
        config=Config(type="darts", unroll_steps=2),
    )
    rw = Reweight(
        "reweight",
        module=from_flax(MetaWeightNet(), jnp.zeros((8,)),
                         rng=jax.random.PRNGKey(1), train_kwarg="train"),
        optimizer=optim.adam(lr=1e-3),
        train_data_loader=[(xv, yv)],
        config=Config(),
    )
    eng = Engine(
        config=EngineConfig(train_iters=iters, strategy=strategy,
                            mesh_shape=mesh_shape, **cfg),
        problems=[rw, clf],
        dependencies={"u2l": {rw: [clf]}, "l2u": {clf: [rw]}},
    )
    eng.run()
    return eng


def test_dcn_batch_sharding_spans_both_axes():
    mesh = make_mesh((("dcn", 2), ("dp", 4)))
    sh = batch_sharding(mesh)
    x = jax.device_put(jnp.zeros((16, DIM)), sh)
    # 16 rows over 2x4 = 8 ways -> 2 rows per device
    assert x.sharding.shard_shape(x.shape)[0] == 2


@pytest.mark.slow
def test_dcn_bilevel_parity_and_hierarchical_collectives():
    eng_dcn = _run("dp", (("dcn", 2), ("dp", 4)))
    eng_ref = _run("default", None)

    err = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(eng_dcn.states["classifier"]["params"]),
            jax.tree_util.tree_leaves(eng_ref.states["classifier"]["params"]),
        )
    )
    assert err < 2e-5, f"dcn run diverged from single-device: {err}"

    # The partitioner must reduce gradients across BOTH axes. With the batch
    # on ("dcn","dp"), XLA emits all-reduce(s) whose replica groups cover
    # all 8 devices; on real multi-slice hardware the runtime decomposes
    # such a group hierarchically (ICI within a slice, DCN across).
    mesh = eng_dcn.mesh
    sh = batch_sharding(mesh)
    x, y = _data(16, 0)
    x = jax.device_put(x, sh)
    y = jax.device_put(y, sh)
    mod = eng_dcn.problems[1].module_fn
    extra = eng_dcn.states["classifier"]["extra"]

    def grad_norm(params, x, y):
        def loss(p):
            logits = mod.apply_fn({"params": p, **extra}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        g = jax.grad(loss)(params)
        return sum(jnp.sum(t * t) for t in jax.tree_util.tree_leaves(g))

    f = jax.jit(grad_norm)
    hlo = f.lower(
        eng_dcn.states["classifier"]["params"], x, y
    ).compile().as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in DCN program"
    import re

    groups = re.search(r"all-reduce[^\n]*replica_groups=\[(\d+),(\d+)\]", hlo)
    if groups:  # flat group form [n_groups, group_size]
        assert int(groups.group(1)) * int(groups.group(2)) == 8


def test_dcn_fsdp_keeps_param_gathers_intra_slice():
    """Under fsdp on a dcn mesh, parameters shard over the intra-slice dp
    axis only — gathers never cross DCN (the slow fabric)."""
    x, y = _data(64, 0)
    xv, yv = _data(32, 1)
    # wide layer so at least one leaf clears fsdp's min-size threshold
    clf = Classifier(
        "classifier",
        module=from_flax(MLP(features=[2048, 2]), jnp.zeros((8, DIM)),
                         rng=jax.random.PRNGKey(0)),
        optimizer=optim.sgd(lr=0.05),
        train_data_loader=[(x, y)],
        config=Config(type="darts", unroll_steps=2),
    )
    rw = Reweight(
        "reweight",
        module=from_flax(MetaWeightNet(), jnp.zeros((8,)),
                         rng=jax.random.PRNGKey(1), train_kwarg="train"),
        optimizer=optim.adam(lr=1e-3),
        train_data_loader=[(xv, yv)],
        config=Config(),
    )
    eng = Engine(
        config=EngineConfig(train_iters=2, strategy="fsdp",
                            mesh_shape=(("dcn", 2), ("dp", 4))),
        problems=[rw, clf],
        dependencies={"u2l": {rw: [clf]}, "l2u": {clf: [rw]}},
    )
    eng.run()
    leaf = max(
        jax.tree_util.tree_leaves(eng.states["classifier"]["params"]),
        key=lambda t: t.size,
    )
    spec = leaf.sharding.spec
    flat = []
    for entry in spec:
        if entry is None:
            continue
        flat.extend(entry if isinstance(entry, tuple) else (entry,))
    assert "dcn" not in flat, f"fsdp sharded a parameter over dcn: {spec}"
    assert "dp" in flat, f"fsdp did not shard over dp: {spec}"


def test_dcn_compiled_block_staging_spans_both_axes():
    """Compiled-block mode on a multi-slice mesh: staged segment batches
    must shard their batch axis over ("dcn", "dp") — the engine's batch
    layout — not a hardcoded "dp" (regression: dcn-replicated staging
    would make cross-slice 'replicas' disagree in a multi-process run)."""
    from betty_tpu.compile import BlockRunner

    eng = _run("dp", (("dcn", 2), ("dp", 4)), iters=0)
    eng.train()
    runner = BlockRunner(eng, scan_periods=1)
    seg_batches = runner.collect_batches()
    leads = [1 if seg.is_scan else 0 for seg in runner.segments]
    staged = runner._device_put_segments(seg_batches, leads)
    checked = 0
    for batch, lead in zip(staged, leads):
        if batch is None:
            continue
        for leaf in jax.tree_util.tree_leaves(batch):
            # batch axis sits behind `lead` staging axes; 8 devices over
            # (dcn=2, dp=4) must each hold 1/8 of it
            assert leaf.sharding.shard_shape(leaf.shape)[lead] == \
                leaf.shape[lead] // 8, leaf.sharding
            checked += 1
    assert checked, "no staged batches were checked"

    # and the engine still matches the single-device trajectory end-to-end
    eng2 = _run("dp", (("dcn", 2), ("dp", 4)), iters=4,
                compile_blocks=True)
    ref = _run("default", None, iters=4)
    err = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(eng2.states["classifier"]["params"]),
            jax.tree_util.tree_leaves(ref.states["classifier"]["params"]),
        )
    )
    assert err < 2e-5, f"dcn compiled-block staging diverged: {err}"
