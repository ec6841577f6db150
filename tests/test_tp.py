"""Tensor parallelism (EngineConfig(strategy="tp")) — a TPU-first capability
beyond the reference's DP-family strategies (SURVEY.md §2.2 lists TP as
absent upstream). Megatron-style sharding rules (betty_tpu/parallel/mesh.py)
place attention heads / MLP columns-rows / embedding vocab over the model
mesh axis; XLA's partitioner inserts the collectives.

Runs on the 8-virtual-device CPU mesh (conftest.py)."""

import importlib.util
import sys
from pathlib import Path

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

EXAMPLES = Path(__file__).resolve().parents[1] / "examples"


def _load_bert(name):
    spec = importlib.util.spec_from_file_location(
        name, EXAMPLES / "bert_data_reweighting" / "main.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


BASE_ARGS = [
    "--batch_size", "16", "--seq_len", "16",
    "--dim", "64", "--depth", "2", "--heads", "4",
    "--train_size", "128", "--meta_size", "64", "--unroll_steps", "2",
    "--precision", "fp32", "--hypergradient", "darts",
]


def _param_by_suffix(params, *suffix):
    """Find a leaf whose path ends with the given key names."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        if tuple(keys[-len(suffix):]) == suffix:
            return leaf
    raise KeyError(suffix)


@pytest.mark.slow
def test_tp_megatron_sharding_layout():
    mod = _load_bert("bert_tp_layout")
    args = mod.parse_args(BASE_ARGS + [
        "--train_iters", "2", "--strategy", "tp", "--mesh", "dp:2,mdl:4",
    ])
    engine = mod.build_engine(args)
    assert engine.mesh.shape == {"dp": 2, "mdl": 4}
    params = engine.states["classifier"]["params"]

    q = _param_by_suffix(params, "query", "kernel")   # (d, h, hd)
    o = _param_by_suffix(params, "out", "kernel")     # (h, hd, d)
    emb = _param_by_suffix(params, "embedding")       # (V, d)
    assert q.sharding.spec == P(None, "mdl", None), q.sharding.spec
    assert o.sharding.spec == P("mdl", None, None), o.sharding.spec
    assert emb.sharding.spec == P("mdl", None), emb.sharding.spec
    # MLP kernels: largest-dim rule == Megatron column then row parallel
    mlp_up = [
        leaf for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        if leaf.ndim == 2 and leaf.shape == (64, 256)
    ]
    assert mlp_up and all(x.sharding.spec == P(None, "mdl") for x in mlp_up)
    mlp_down = [
        leaf for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        if leaf.ndim == 2 and leaf.shape == (256, 64)
    ]
    assert mlp_down and all(x.sharding.spec == P("mdl", None) for x in mlp_down)

    # optimizer state mirrors the parameter layout (path-matched rules)
    opt_leaves = [
        x for x in jax.tree_util.tree_leaves(
            engine.states["classifier"]["opt_state"]
        )
        if hasattr(x, "sharding") and x.ndim == 3
    ]
    assert any(x.sharding.spec == P(None, "mdl", None) for x in opt_leaves)

    engine.run()
    # TP layout survives the update (not silently replicated); XLA may trim
    # trailing None dims from the spec, so compare the effective shard shape
    q2 = _param_by_suffix(engine.states["classifier"]["params"], "query", "kernel")
    assert q2.sharding.shard_shape(q2.shape)[1] == q2.shape[1] // 4
    assert all(
        np.all(np.isfinite(np.asarray(x)))
        for x in jax.tree_util.tree_leaves(engine.states["reweight"]["params"])
    )


def test_tp_matches_single_device_numerics():
    """TP partitions compute but must not change the math: final parameter
    trajectories match the unsharded single-device run to fp32 tolerance."""
    mod = _load_bert("bert_tp_numerics")
    runs = {}
    for strat, extra in (("default", []),
                         ("tp", ["--strategy", "tp", "--mesh", "dp:2,mdl:4"])):
        args = mod.parse_args(BASE_ARGS + ["--train_iters", "4"] + extra)
        engine = mod.build_engine(args)
        engine.run()
        runs[strat] = jax.tree_util.tree_map(
            lambda x: np.asarray(x), engine.states["classifier"]["params"]
        )
    err = max(
        float(np.max(np.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(runs["default"]),
                        jax.tree_util.tree_leaves(runs["tp"]))
    )
    assert err < 2e-5, f"TP diverged from single-device numerics: {err}"


def test_tp_hlo_contains_collectives():
    """Compile-time evidence: the TP meta-step's optimized HLO contains
    cross-device reductions over the model axis (the attention/MLP
    row-parallel reduce), and per-device parameter shards are smaller than
    the full tensors."""
    mod = _load_bert("bert_tp_hlo")
    args = mod.parse_args(BASE_ARGS + [
        "--train_iters", "0", "--strategy", "tp", "--mesh", "dp:2,mdl:4",
    ])
    engine = mod.build_engine(args)
    clf = engine.classifier
    engine.train()
    clf._count = 1
    batch = clf.get_batch()
    upd = clf._get_update_fn(apply_update=True, advance_sched=True)
    hlo = upd.lower(
        engine.states, batch, {}, {}, jax.random.PRNGKey(0)
    ).compile().as_text()
    assert ("all-reduce" in hlo) or ("reduce-scatter" in hlo), (
        "TP step compiled without cross-shard reductions"
    )

    q = _param_by_suffix(engine.states["classifier"]["params"], "query", "kernel")
    shard_shape = q.sharding.shard_shape(q.shape)
    assert np.prod(shard_shape) * 4 <= np.prod(q.shape), (
        "qkv parameter not actually partitioned 4-way over mdl"
    )


def test_tp_user_shard_rules_override():
    """Config.shard_rules lets users pin specific parameters' layouts."""
    from betty_tpu.parallel import make_mesh, tp_shardings
    import jax.numpy as jnp

    mesh = make_mesh((("dp", 2), ("mdl", 4)))
    tree = {"Dense_0": {"kernel": jnp.zeros((64, 256))},
            "tiny": jnp.zeros((8,))}
    sh = tp_shardings(tree, mesh,
                      rules=((r"Dense_0/kernel$", ("mdl", None)),))
    assert sh["Dense_0"]["kernel"].spec == P("mdl", None)  # user rule wins
    assert sh["tiny"].spec == P()


@pytest.mark.slow
def test_tp_composes_with_compiled_blocks():
    """TP sharding must survive compiled-block execution: block-mode and
    driver-mode runs on the same dp x mdl mesh agree, and the parameters
    stay mdl-sharded after the blocks."""
    mod = _load_bert("bert_tp_blocks")

    def build(compile_blocks):
        args = mod.parse_args(BASE_ARGS + [
            "--train_iters", "4", "--strategy", "tp",
            "--mesh", "dp:2,mdl:4",
        ] + (["--compile_blocks"] if compile_blocks else []))
        engine = mod.build_engine(args)
        engine.run()
        q = _param_by_suffix(engine.states["classifier"]["params"],
                             "query", "kernel")
        assert q.sharding.shard_shape(q.shape)[1] == q.shape[1] // 4, (
            "TP layout lost in compiled-block mode"
        )
        return np.concatenate([
            np.asarray(x).ravel()
            for x in jax.tree_util.tree_leaves(
                engine.states["classifier"]["params"]
            )
        ])

    w_block = build(True)
    w_driver = build(False)
    err = float(np.max(np.abs(w_block - w_driver)))
    assert err < 2e-5, f"TP block mode diverged from driver mode: {err}"
