"""Checkpoint / resume via orbax.

The reference has no engine-level checkpointing; examples hand-roll
``torch.save(problem.state_dict())`` inside ``validation()``
(``examples/learning_to_reweight/main.py:171-178``). Here the whole engine
state — every problem's pytree plus the host-side counters needed for exact
resume — is saved atomically with orbax.
"""

import json
import os
from typing import Any, Dict

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


def _host_meta(engine) -> Dict[str, Any]:
    return {
        "global_step": engine.global_step,
        "counts": {p.name: p._count for p in engine.problems},
        "epoch_counters": {
            p.name: p.epoch_counter for p in engine.problems if p.epoch_counter
        },
        # intra-epoch iterator positions: ArrayLoader-backed problems resume
        # mid-epoch exactly (iter_from); other iterables restart their epoch
        # (documented: exact resume at epoch boundaries only)
        "batches_served": {
            p.name: p.batches_served
            for p in engine.problems
            if getattr(p, "batches_served", None)
        },
        # unroll-phase flags: a mid-unroll checkpoint must re-run
        # on_inner_loop_start (and re-cache roll-back state) only if the
        # interrupted run would have
        "inner_loop_start": {
            p.name: p._inner_loop_start for p in engine.problems
        },
        "rollback_cached": [
            p.name for p in engine.problems if p._state_cache is not None
        ],
    }


def _to_host(tree):
    """device_get that also handles multi-host global arrays (a plain
    device_get raises on non-fully-addressable shards); every process must
    call this (process_allgather is collective)."""

    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            # tiled=True: reassemble the GLOBAL value (stacking per-process
            # shards is rejected for non-fully-addressable arrays — caught
            # by the 4-process fsdp test)
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True)
            )
        return jax.device_get(x)

    return jax.tree_util.tree_map(get, tree)


def save_engine_state(engine, path: str):
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    states = {name: _to_host(s) for name, s in engine.states.items()}
    # roll-back caches are live state too: a mid-unroll checkpoint under
    # roll_back must restore the pre-unroll snapshot or the post-meta-update
    # re-step would recover from the wrong point
    for p in engine.problems:
        if p._state_cache is not None:
            states[f"__rollback__{p.name}"] = _to_host(p._state_cache)
    # ITD problems mid-unroll: the recorded differentiation starting point
    # and consumed batches are live state too (the parent's replay needs
    # them; without this a mid-unroll resume of an IterativeProblem crashes)
    meta_extra = {}
    for p in engine.problems:
        start = getattr(p, "_unroll_start_state", None)
        batches = getattr(p, "_unroll_batches", None)
        resumable = (
            p.train_data_loader is not None
            and all(hasattr(dl, "iter_from") for dl in p.train_data_loader)
        )
        if start is not None and batches and resumable:
            # restore rebuilds the batch skeleton via iter_from; loaders
            # without it restart their epoch on resume (documented), so
            # recording their unroll would orphan checkpoint keys
            states[f"__unroll_start__{p.name}"] = _to_host(start)
            host_batches = [_to_host(b) for b in batches]  # collective
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *host_batches
            )
            states[f"__unroll_batches__{p.name}"] = stacked
            meta_extra.setdefault("unroll_recorded", {})[p.name] = len(batches)
    # all processes participated in the collective gathers above
    if _HAS_ORBAX:
        # EVERY process calls orbax: its save path synchronizes internally
        # (a rank-0-only call leaves peers racing into the program's next
        # collective and desyncs the comm layer — caught by the
        # multi-process checkpoint test); orbax writes from the primary
        # host only (shared-filesystem assumption, as with torch.save)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, f"step_{engine.global_step}"),
                   states, force=True)
        ckptr.wait_until_finished()
    elif jax.process_index() == 0:  # numpy fallback: no internal barriers
        flat, _ = jax.tree_util.tree_flatten_with_path(states)
        np.savez(
            os.path.join(path, f"step_{engine.global_step}.npz"),
            **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        )
    if jax.process_index() == 0:
        # atomic: a preemption mid-write must not brick auto_resume with a
        # truncated meta.json (the restart would crash in json.load forever)
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump({**_host_meta(engine), **meta_extra}, f)
        os.replace(tmp, os.path.join(path, "meta.json"))
    if jax.process_count() > 1:
        # peers must not read meta.json (or re-enter training collectives)
        # before the writer finishes
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("betty_tpu_ckpt_meta")


def restore_engine_state(engine, path: str):
    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    step = meta["global_step"]

    def skeleton(tree):
        # structure + shape/dtype only; a concrete copy would allgather the
        # full (possibly ZeRO/FSDP-sharded, multi-GB) state on every process
        def leaf(x):
            dtype = getattr(x, "dtype", None)
            if dtype is None:
                dtype = np.asarray(x).dtype  # python scalar leaves
            return jax.ShapeDtypeStruct(np.shape(x), dtype)

        return jax.tree_util.tree_map(leaf, tree)

    states = {name: skeleton(s) for name, s in engine.states.items()}
    # skeleton entries for saved roll-back caches (same pytree structure as
    # the problem's state)
    for name in meta.get("rollback_cached", []):
        states[f"__rollback__{name}"] = states[name]
    # skeletons for mid-unroll ITD recordings: start state mirrors the
    # problem state; the stacked-batches skeleton is probed from the loader
    # (requires ArrayLoader-style iter_from — generic iterables restart
    # their epoch on resume, so no unroll can be mid-flight for them)
    for pname, k in meta.get("unroll_recorded", {}).items():
        p = next(q for q in engine.problems if q.name == pname)
        if not all(hasattr(dl, "iter_from") for dl in p.train_data_loader):
            continue
        probes = tuple(
            p._convert_batch(next(dl.iter_from(0, 0)))
            for dl in p.train_data_loader
        )
        probe = probes[0] if len(probes) == 1 else probes
        states[f"__unroll_start__{pname}"] = states[pname]
        states[f"__unroll_batches__{pname}"] = jax.tree_util.tree_map(
            lambda a: np.zeros((k,) + tuple(np.shape(a)),
                               dtype=np.asarray(a).dtype),
            _to_host(probe),
        )

    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.join(path, f"step_{step}"), states)
    else:
        data = np.load(os.path.join(path, f"step_{step}.npz"))
        flat, treedef = jax.tree_util.tree_flatten_with_path(states)
        restored = jax.tree_util.tree_unflatten(
            treedef, [data[jax.tree_util.keystr(k)] for k, _ in flat]
        )
    rollback_caches, unroll_starts, unroll_batches = {}, {}, {}
    for name, st in restored.items():
        if name.startswith("__rollback__"):
            rollback_caches[name[len("__rollback__"):]] = st
            continue
        if name.startswith("__unroll_start__"):
            unroll_starts[name[len("__unroll_start__"):]] = st
            continue
        if name.startswith("__unroll_batches__"):
            unroll_batches[name[len("__unroll_batches__"):]] = st
            continue
        # preserve each leaf's sharding (ZeRO/FSDP layouts must survive
        # resume or a model that only fits sharded will OOM replicated)
        engine.states[name] = jax.tree_util.tree_map(
            lambda new, cur: jax.device_put(
                jax.numpy.asarray(new, dtype=cur.dtype), cur.sharding
            ),
            st,
            engine.states[name],
        )
    engine.global_step = step
    for p in engine.problems:
        if p.name in rollback_caches:
            p._state_cache = jax.tree_util.tree_map(
                lambda new, cur: jax.device_put(
                    jax.numpy.asarray(new, dtype=cur.dtype), cur.sharding
                ),
                rollback_caches[p.name],
                engine.states[p.name],
            )
        if p.name in meta.get("inner_loop_start", {}):
            p._inner_loop_start = meta["inner_loop_start"][p.name]
        p._count = meta["counts"][p.name]
        if p.name in meta.get("epoch_counters", {}):
            p.epoch_counter = meta["epoch_counters"][p.name]
        served = meta.get("batches_served", {}).get(p.name)
        if served and p.train_data_loader is not None:
            p.batches_served = list(served)
            for i, dl in enumerate(p.train_data_loader):
                if hasattr(dl, "set_epoch"):
                    dl.set_epoch(p.epoch_counter[i])
                if hasattr(dl, "iter_from"):
                    # ArrayLoader: resume mid-epoch at the exact batch
                    p.train_data_iterator[i] = dl.iter_from(
                        p.epoch_counter[i], served[i]
                    )
                    if hasattr(dl, "sync_cursor"):
                        dl.sync_cursor(p.epoch_counter[i], served[i])
                else:
                    # generic iterable: the epoch restarts from batch 0, so
                    # the served counter must restart too or the NEXT
                    # checkpoint would record batches never consumed
                    p.batches_served[i] = 0
        if p.name in unroll_starts and p.name in unroll_batches:
            # mid-unroll ITD recording: restore the differentiation start
            # state and re-split the stacked batches (device arrays)
            k = meta["unroll_recorded"][p.name]
            p._unroll_start_state = jax.tree_util.tree_map(
                lambda new, cur: jax.device_put(
                    jax.numpy.asarray(new, dtype=cur.dtype), cur.sharding
                ),
                unroll_starts[p.name],
                engine.states[p.name],
            )
            stacked = jax.tree_util.tree_map(
                jax.numpy.asarray, unroll_batches[p.name]
            )
            p._unroll_batches = [
                jax.tree_util.tree_map(lambda a: a[j], stacked)
                for j in range(k)
            ]
            p._unroll_stack_cache = None
            p._pending_unroll_reset = False
