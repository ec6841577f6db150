"""Strategy one-liners (pp / ep / sp) and 3-axis parallelism composition.

VERDICT r2 #5: (a) one mesh dp x mdl x pp running the pipelined+TP
transformer bilevel program with numeric parity vs single device and HLO
collective assertions; (b) ``strategy="pp"|"ep"|"sp"`` as one-line
scale-up (auto-applying the model-builder layouts where the module shape
allows, loud error otherwise). Mirrors the reference's one-line strategy
ethos (leopard-ai/betty README.md:39-49) for the parallelism families the
reference does not have.

Runs on the 8-virtual-device CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.models import MetaWeightNet, make_pipelined_transformer
from betty_tpu.models.moe import init_moe_params, moe_ffn
from betty_tpu.module import from_flax, from_fn
from betty_tpu.parallel import make_mesh

CFG = dict(vocab_size=64, max_len=8, dim=16, depth=4, heads=2,
           num_classes=2, pad_id=1)


def _data(n=64, seed=0):
    r = np.random.RandomState(seed)
    ids = r.randint(2, CFG["vocab_size"], size=(n, CFG["max_len"]))
    y = r.randint(0, 2, size=n)
    return jnp.asarray(ids, jnp.int32), jnp.asarray(y, jnp.int32)


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


def _transformer_engine(strategy, mesh_shape, module, shard_rules=None,
                        iters=3):
    ids, y = _data(64, seed=0)
    mids, my = _data(32, seed=1)
    mwn = from_flax(MetaWeightNet(), jnp.zeros((8,)),
                    rng=jax.random.PRNGKey(1), train_kwarg="train")
    clf = Classifier(
        "classifier", module=module, optimizer=optim.sgd(lr=0.05),
        train_data_loader=[(ids, y)],
        config=Config(type="darts", unroll_steps=2, shard_rules=shard_rules),
    )
    rw = Reweight(
        "reweight", module=mwn, optimizer=optim.adam(lr=1e-3),
        train_data_loader=[(mids, my)], config=Config(),
    )
    eng = Engine(
        config=EngineConfig(train_iters=iters, strategy=strategy,
                            mesh_shape=mesh_shape),
        problems=[rw, clf],
        dependencies={"u2l": {rw: [clf]}, "l2u": {clf: [rw]}},
    )
    eng.run()
    return eng


def _params_err(a, b):
    return max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))
    )


# ---------------------------------------------------------------------------
# one-liners
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_strategy_pp_one_liner():
    """strategy='pp' alone (no shard_rules) shards the stacked blocks over
    the pp axis and matches the single-device trajectory."""
    mesh = make_mesh((("dp", 2), ("pp", 4)))
    pp_mod = make_pipelined_transformer(mesh, **CFG,
                                        rng=jax.random.PRNGKey(0),
                                        num_microbatches=4)
    seq_mod = make_pipelined_transformer(None, **CFG,
                                         rng=jax.random.PRNGKey(0))
    eng_pp = _transformer_engine("pp", (("dp", 2), ("pp", 4)), pp_mod)
    eng_seq = _transformer_engine("default", None, seq_mod)

    blocks = eng_pp.states["classifier"]["params"]["blocks"]
    leaf = jax.tree_util.tree_leaves(blocks)[0]
    assert leaf.sharding.shard_shape(leaf.shape)[0] == leaf.shape[0] // 4

    assert _params_err(eng_pp.states["classifier"]["params"],
                       eng_seq.states["classifier"]["params"]) < 2e-5
    assert _params_err(eng_pp.states["reweight"]["params"],
                       eng_seq.states["reweight"]["params"]) < 2e-5


def test_strategy_pp_loud_errors():
    mesh_shape = (("dp", 8),)  # no pp axis
    mod = make_pipelined_transformer(None, **CFG, rng=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="pp"):
        _transformer_engine("pp", mesh_shape, mod, iters=1)

    # right mesh, wrong module shape (no stacked blocks)
    from betty_tpu.models.transformer import TransformerClassifier

    flat = from_flax(
        TransformerClassifier(vocab_size=64, max_len=8, dim=16, depth=2,
                              heads=2, dropout=0.0),
        jnp.zeros((4, 8), jnp.int32), rng=jax.random.PRNGKey(0),
        train_kwarg="train",
    )
    with pytest.raises(ValueError, match="blocks"):
        _transformer_engine("pp", (("dp", 2), ("pp", 4)), flat, iters=1)


DIM, HID, E, T = 16, 32, 8, 64


def _moe_engine(strategy, mesh_shape, iters=4):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(T, DIM), jnp.float32)
    y = jnp.asarray(rng.randint(0, 2, T), jnp.int32)
    xv = jnp.asarray(rng.randn(32, DIM), jnp.float32)
    yv = jnp.asarray(rng.randint(0, 2, 32), jnp.int32)
    moe_p = init_moe_params(jax.random.PRNGKey(0), DIM, HID, E)
    out_w = jnp.asarray(0.1 * rng.randn(DIM, 2), jnp.float32)

    def apply(p, inp):
        h, aux = moe_ffn(p["moe"], inp, capacity=inp.shape[0])
        return (inp + h) @ p["out"], aux

    class MoEInner(ImplicitProblem):
        def training_step(self, batch):
            bx, by = batch
            logits, aux = self.module(bx)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, by)
            w = self.outer(jax.lax.stop_gradient(ce))
            return jnp.mean(w * ce) + 0.01 * aux

    class MoEOuter(ImplicitProblem):
        def training_step(self, batch):
            bx, by = batch
            logits, _ = self.inner(bx)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, by).mean()

    inner = MoEInner("inner", module=from_fn(apply, {"moe": moe_p,
                                                     "out": out_w}),
                     optimizer=optim.sgd(lr=0.05), train_data_loader=[(x, y)],
                     config=Config(type="darts", unroll_steps=2))
    outer = MoEOuter("outer",
                     module=from_flax(MetaWeightNet(), jnp.zeros((8,)),
                                      rng=jax.random.PRNGKey(1),
                                      train_kwarg="train"),
                     optimizer=optim.adam(lr=1e-3),
                     train_data_loader=[(xv, yv)], config=Config())
    eng = Engine(
        config=EngineConfig(train_iters=iters, strategy=strategy,
                            mesh_shape=mesh_shape),
        problems=[outer, inner],
        dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
    )
    eng.run()
    return eng


def test_strategy_ep_one_liner():
    eng_ep = _moe_engine("ep", (("dp", 2), ("ep", 4)))
    eng_ref = _moe_engine("default", None)
    w1 = eng_ep.states["inner"]["params"]["moe"]["w1"]
    assert w1.sharding.shard_shape(w1.shape)[0] == E // 4
    assert _params_err(eng_ep.states["inner"]["params"],
                       eng_ref.states["inner"]["params"]) < 2e-5


def test_strategy_ep_loud_error_non_moe():
    mod = make_pipelined_transformer(None, **CFG, rng=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="expert"):
        _transformer_engine("ep", (("dp", 2), ("ep", 4)), mod, iters=1)


def test_strategy_sp_one_liner():
    mesh = make_mesh((("dp", 2), ("sp", 4)))
    sp_mod = make_pipelined_transformer(mesh, **CFG,
                                        rng=jax.random.PRNGKey(0),
                                        seq_axis="sp")
    seq_mod = make_pipelined_transformer(None, **CFG,
                                         rng=jax.random.PRNGKey(0))
    eng_sp = _transformer_engine("sp", (("dp", 2), ("sp", 4)), sp_mod)
    eng_seq = _transformer_engine("default", None, seq_mod)
    assert _params_err(eng_sp.states["classifier"]["params"],
                       eng_seq.states["classifier"]["params"]) < 2e-4
    with pytest.raises(ValueError, match="sp"):
        _transformer_engine("sp", (("dp", 8),), sp_mod, iters=1)


# ---------------------------------------------------------------------------
# 3-axis composition: dp x mdl x pp in ONE mesh
# ---------------------------------------------------------------------------

_COMPOSED_RULES = (
    # stacked attention projections: stages on pp, heads on mdl
    (r"blocks/.*(query|key|value)/kernel$", ("pp", None, "mdl", None)),
    (r"blocks/.*out/kernel$", ("pp", "mdl", None, None)),
    # stacked MLP: column-parallel then row-parallel (Megatron)
    (r"blocks/.*Dense_0/kernel$", ("pp", None, "mdl")),
    (r"blocks/.*Dense_1/kernel$", ("pp", "mdl", None)),
    # remaining stacked leaves (LayerNorm, biases): stages on pp only
    (r"^blocks", ("pp",)),
    (r".*", ()),
)


@pytest.mark.slow
def test_three_axis_dp_tp_pp_composition():
    """dp(2) x mdl(2) x pp(2): batch data-parallel, attention heads + MLP
    tensor-parallel, encoder stages pipeline-parallel — all in one mesh,
    one engine, matching the single-device trajectory."""
    mesh = make_mesh((("dp", 2), ("mdl", 2), ("pp", 2)))
    pp_mod = make_pipelined_transformer(mesh, **CFG,
                                        rng=jax.random.PRNGKey(0),
                                        num_microbatches=2)
    seq_mod = make_pipelined_transformer(None, **CFG,
                                         rng=jax.random.PRNGKey(0))
    eng_3d = _transformer_engine(
        "tp", (("dp", 2), ("mdl", 2), ("pp", 2)), pp_mod,
        shard_rules=_COMPOSED_RULES,
    )
    eng_seq = _transformer_engine("default", None, seq_mod)

    # stage axis AND head axis both sharded on the attention kernels
    qk = eng_3d.states["classifier"]["params"]["blocks"]
    leaf = None
    for path, x in jax.tree_util.tree_leaves_with_path(qk):
        if "query" in str(path) and x.ndim == 4:
            leaf = x
            break
    assert leaf is not None
    shard = leaf.sharding.shard_shape(leaf.shape)
    assert shard[0] == leaf.shape[0] // 2, "stages not sharded over pp"
    assert shard[2] == leaf.shape[2] // 2, "heads not sharded over mdl"

    assert _params_err(eng_3d.states["classifier"]["params"],
                       eng_seq.states["classifier"]["params"]) < 2e-5
    assert _params_err(eng_3d.states["reweight"]["params"],
                       eng_seq.states["reweight"]["params"]) < 2e-5


def test_three_axis_collectives_in_hlo():
    """The compiled 3-axis forward+backward actually communicates: the HLO
    contains collectives (pipeline ppermute and/or TP reductions)."""
    mesh = make_mesh((("dp", 2), ("mdl", 2), ("pp", 2)))
    pp_mod = make_pipelined_transformer(mesh, **CFG,
                                        rng=jax.random.PRNGKey(0),
                                        num_microbatches=2)
    ids, y = _data(16)

    def loss(v):
        logits = pp_mod.apply(v, ids, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    f = jax.jit(jax.grad(loss))
    hlo = f.lower(pp_mod.variables).compile().as_text()
    assert ("collective-permute" in hlo) or ("all-reduce" in hlo) or (
        "all-gather" in hlo), "no collectives in 3-axis compiled program"


def test_strategy_pp_ep_replicate_non_matching_problems():
    """A problem whose module does NOT have the pp/ep layout must be
    REPLICATED under strategy='pp'/'ep' — not fall through to
    tp_shardings' Megatron defaults, which would silently column-shard any
    large dense kernel over the dp axis (regression: the one-liner docs
    promise 'replicate everything else')."""
    from betty_tpu.parallel.mesh import shard_state

    mesh = make_mesh((("dp", 2), ("pp", 2), ("ep", 2)))
    # large enough (128*64 = 8192 >= the TP min_size 2**12) that the old
    # fall-through WOULD have sharded it
    state = {
        "params": {"Dense_0": {"kernel": jnp.ones((128, 64))}},
        "opt_state": {"mu": {"Dense_0": {"kernel": jnp.zeros((128, 64))}}},
    }
    for strategy in ("pp", "ep"):
        out = shard_state(dict(state), mesh, strategy)
        for leaf in jax.tree_util.tree_leaves(out):
            assert leaf.sharding.is_fully_replicated, (
                f"strategy={strategy!r} sharded a non-matching problem: "
                f"{leaf.sharding}"
            )
