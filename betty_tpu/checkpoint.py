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
    }


def save_engine_state(engine, path: str):
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    states = {name: jax.device_get(s) for name, s in engine.states.items()}
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, f"step_{engine.global_step}"), states,
                   force=True)
        ckptr.wait_until_finished()
    else:  # numpy fallback
        flat, _ = jax.tree_util.tree_flatten_with_path(states)
        np.savez(
            os.path.join(path, f"step_{engine.global_step}.npz"),
            **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(_host_meta(engine), f)


def restore_engine_state(engine, path: str):
    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    step = meta["global_step"]
    states = {name: jax.device_get(s) for name, s in engine.states.items()}
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.join(path, f"step_{step}"), states)
    else:
        data = np.load(os.path.join(path, f"step_{step}.npz"))
        flat, treedef = jax.tree_util.tree_flatten_with_path(states)
        restored = jax.tree_util.tree_unflatten(
            treedef, [data[jax.tree_util.keystr(k)] for k, _ in flat]
        )
    for name, st in restored.items():
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
        p._count = meta["counts"][p.name]
        if p.name in meta.get("epoch_counters", {}):
            p.epoch_counter = meta["epoch_counters"][p.name]
