"""Device mesh and sharding layouts.

TPU-native replacement for the reference's entire distributed layer
(``betty/patch/*`` + DDP/ZeRO/FSDP wrapping in ``betty/problems/problem.py:198-282``
+ NCCL collectives in ``betty/engine.py:166-199``):

* **DP** (reference ``strategy="distributed"``): batches sharded over the
  ``dp`` mesh axis, parameters replicated. Gradient allreduce, hypergradient
  allreduce, and the darts/sama global vector norm all fall out of XLA's
  partitioner — none of the reference's DDP-hook ``do_sync`` routing or
  ``synchronize_params`` broadcasts (``problem.py:599-609``) are needed,
  because replicated values under jit can never diverge.
* **ZeRO** (``strategy="zero"``): DP + optimizer state sharded over ``dp``
  (the sharded-weight-update trick of arXiv:2004.13336 — XLA inserts
  reduce-scatter/all-gather around the optimizer).
* **FSDP** (``strategy="fsdp"``): parameters, gradients and optimizer state
  all sharded over ``dp``; XLA all-gathers parameters per use.

All collectives ride ICI within a slice; multi-slice topologies can put a
``dcn`` axis first in ``mesh_shape``.
"""

import math
import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Optional[Tuple[Tuple[str, int], ...]] = None,
    devices=None,
) -> Mesh:
    """Build a Mesh. Default: all devices on one ``dp`` axis."""
    if devices is None:
        devices = jax.devices()
    if mesh_shape is None:
        mesh_shape = (("dp", len(devices)),)
    names = tuple(n for n, _ in mesh_shape)
    sizes = tuple(s for _, s in mesh_shape)
    assert math.prod(sizes) == len(devices), (
        f"mesh {mesh_shape} does not cover {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard the leading (batch) axis; replacement for the reference's
    ``DistributedBatchSampler`` (``betty/patch/data_loader.py:7-61``).

    Default axis: ``("dcn", "dp")`` when the mesh has a ``dcn`` (multi-
    slice) axis, else ``"dp"``. Traffic placement: the batch is the ONLY
    tensor that should span ``dcn`` — gradient/hypergradient all-reduces
    then decompose hierarchically (fast ICI reduction within each slice, a
    single slow DCN reduction across slices), while FSDP/ZeRO/TP parameter
    gathers stay on intra-slice axes (``dp``/``mdl``), never crossing DCN.
    """
    if axis is None:
        axes = tuple(a for a in ("dcn", "dp") if a in mesh.shape)
        axis = axes if axes else "dp"
    return NamedSharding(mesh, P(axis))


def _shard_leaf_spec(x, axis_name: str, axis_size: int, min_size: int) -> P:
    """FSDP rule: shard the largest dimension divisible by the axis size;
    small leaves stay replicated (same spirit as FSDP's min-wrap sizes)."""
    if not hasattr(x, "shape") or x.ndim == 0 or x.size < min_size:
        return P()
    dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
    for d in dims:
        if x.shape[d] % axis_size == 0 and x.shape[d] >= axis_size:
            spec = [None] * x.ndim
            spec[d] = axis_name
            return P(*spec)
    return P()


def fsdp_shardings(tree, mesh: Mesh, axis: Optional[str] = None,
                   min_size: int = 2**14):
    """Per-leaf NamedShardings sharding each large tensor over ``axis``.

    Default axis: ``"mdl"`` if the mesh has one (2-D dp x mdl layouts shard
    parameters over the model axis while the batch rides ``dp``), else
    ``"dp"``."""
    if axis is None:
        axis = "mdl" if "mdl" in mesh.shape else "dp"
    axis_size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, _shard_leaf_spec(x, axis, axis_size, min_size)
        ),
        tree,
    )


# --------------------------------------------------------------------- TP
#
# Megatron-style tensor parallelism (arXiv:1909.08053) as sharding layouts —
# a TPU-first capability beyond the reference's DP-family strategies. Rules
# are matched against the parameter's pytree path (flax naming):
#
#   attention query/key/value kernel (d, h, hd) -> heads sharded (column
#     parallel); out kernel (h, hd, d) -> heads sharded (row parallel), so
#     the attention block computes on local heads and the partitioner
#     reduces once at the output projection;
#   MLP 2-D kernels fall back to the largest-dim rule, which IS Megatron
#     for pre-LN MLPs: (d, 4d) shards columns, (4d, d) shards rows;
#   token embeddings (V, d) -> vocab sharded;
#   LayerNorm / small biases -> replicated.
#
# Optimizer-state trees (optax mu/nu/momentum) mirror the parameter tree
# including names, so the same path rules shard them identically.

_TP_RULES = (
    (re.compile(r"(query|key|value)/(kernel|bias)$"),
     # column-parallel in both layouts: heads (3-D) or the fused h*hd
     # OUTPUT dim (2-D) are sharded; sharding the 2-D contraction dim would
     # force a reduction per projection and replicate the attention
     # activations (the Megatron pattern would be lost)
     lambda ax, x: P(None, ax, None) if x.ndim == 3 else
     (P(None, ax) if x.ndim == 2 else None)),
    (re.compile(r"out/kernel$"),
     lambda ax, x: P(ax, None, None) if x.ndim == 3 else None),
    (re.compile(r"out/bias$"), lambda ax, x: P()),
    (re.compile(r"embedding$"),
     lambda ax, x: P(ax, None) if x.ndim == 2 else None),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", k))))
    return "/".join(parts)


def _spec_fits(x, spec: P, mesh: Mesh) -> bool:
    """A spec fits iff every named dimension is divisible by the TOTAL size
    of the axes it names (each spec entry may be one axis or a tuple)."""
    for d, names in enumerate(spec):
        if names is None:
            continue
        if d >= x.ndim:
            return False
        ns = names if isinstance(names, tuple) else (names,)
        size = math.prod(mesh.shape[n] for n in ns)
        if x.shape[d] % size != 0:
            return False
    return True


def tp_shardings(tree, mesh: Mesh, axis: Optional[str] = None,
                 min_size: int = 2**12,
                 rules: Optional[Sequence] = None):
    """Per-leaf NamedShardings for Megatron-style tensor parallelism.

    ``rules``: optional user overrides checked first — a sequence of
    ``(path_regex, partition_spec_tuple)`` pairs, e.g.
    ``[(r"Dense_0/kernel$", (None, "mdl"))]`` (``Config.shard_rules``).
    """
    if axis is None:
        axis = "mdl" if "mdl" in mesh.shape else "dp"
    axis_size = mesh.shape[axis]
    user = tuple(
        (re.compile(pat), tuple(spec)) for pat, spec in (rules or ())
    )

    def spec_for(path, x):
        if not hasattr(x, "shape"):
            return P()
        pstr = _path_str(path)
        for pat, spec_t in user:
            if pat.search(pstr):
                spec = P(*spec_t)
                if _spec_fits(x, spec, mesh):
                    return spec
        for pat, fn in _TP_RULES:
            if pat.search(pstr):
                spec = fn(axis, x)
                if spec is not None and _spec_fits(x, spec, mesh):
                    return spec
        if x.ndim == 0 or x.size < min_size:
            return P()
        return _shard_leaf_spec(x, axis, axis_size, min_size)

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec_for(p, x)), tree
    )


# Expert-stacked MoE leaves (models/moe.py's layout). ONE definition shared
# by the sharder (_ep_rules) and the matcher (strategy_matches) so the
# engine's loud-error guarantee cannot drift from the actual layout.
_MOE_EXPERT_LEAF = re.compile(r"(^|/)moe/(w[0-9]+|b[0-9]+)$")


def _has_stacked_blocks(params) -> bool:
    """models.make_pipelined_transformer's layout: stage-stacked block
    parameters under ``params["blocks"]``."""
    return isinstance(params, dict) and "blocks" in params


def _pp_rules(state, mesh: Mesh):
    """One-liner ``strategy="pp"``: stage-stacked block parameters (leading
    depth axis, ``params["blocks"]`` — models.make_pipelined_transformer's
    layout) sharded over the ``pp`` mesh axis; everything else replicated.
    Loud errors when the module or mesh doesn't fit the layout."""
    if "pp" in mesh.shape:
        axis = "pp"
    else:
        raise ValueError(
            "strategy='pp' needs a mesh with a 'pp' axis — pass "
            "EngineConfig(mesh_shape=(('dp', N), ('pp', M))) "
            f"(got axes {tuple(mesh.shape)})"
        )
    params = state.get("params")
    if not _has_stacked_blocks(params):
        return None  # not a pipelined module: replicate (engine validates
        # that at least one problem in the program matched)
    size = mesh.shape[axis]
    for leaf in jax.tree_util.tree_leaves(params["blocks"]):
        if leaf.shape[0] % size != 0:
            raise ValueError(
                f"strategy='pp': stacked depth {leaf.shape[0]} is not "
                f"divisible by the pp axis size {size}"
            )
    return ((r"^blocks", (axis,)), (r".*", ()))


def _ep_rules(state, mesh: Mesh):
    """One-liner ``strategy="ep"``: expert-stacked MoE parameters (leading
    num_experts axis under a ``moe`` subtree — models/moe.py's layout)
    sharded over the ``ep`` mesh axis; router and everything else
    replicated."""
    if "ep" not in mesh.shape:
        raise ValueError(
            "strategy='ep' needs a mesh with an 'ep' axis — pass "
            "EngineConfig(mesh_shape=(('dp', N), ('ep', M))) "
            f"(got axes {tuple(mesh.shape)})"
        )
    size = mesh.shape["ep"]
    matched = [
        (p, x) for p, x in _iter_path_leaves(state.get("params", {}))
        if _MOE_EXPERT_LEAF.search(p)
    ]
    if not matched:
        return None  # not an MoE module: replicate (engine validates that
        # at least one problem in the program matched)
    for p, x in matched:
        if x.shape[0] % size != 0:
            raise ValueError(
                f"strategy='ep': {p} has {x.shape[0]} experts, not "
                f"divisible by the ep axis size {size}"
            )
    return ((_MOE_EXPERT_LEAF.pattern, ("ep",)), (r".*", ()))


def _iter_path_leaves(tree):
    for path, x in jax.tree_util.tree_leaves_with_path(tree):
        if hasattr(x, "shape"):
            yield _path_str(path), x


def strategy_matches(strategy: str, state) -> bool:
    """Whether a problem's state has the module layout ``strategy`` shards
    (pp: stacked ``params["blocks"]``; ep: ``moe/*`` expert-stacked)."""
    params = state.get("params")
    if strategy == "pp":
        return _has_stacked_blocks(params)
    if strategy == "ep":
        return any(_MOE_EXPERT_LEAF.search(p)
                   for p, _ in _iter_path_leaves(params or {}))
    return True


def shard_state(state, mesh: Mesh, strategy: str = "dp", rules=None):
    """Place one problem's state pytree according to the strategy.

    dp:    everything replicated.
    zero:  params/grads replicated; opt_state FSDP-sharded.
    fsdp:  params, grad_acc, last_grad and opt_state FSDP-sharded.
    tp:    params/grads/opt_state sharded by Megatron tensor-parallel rules
           (plus ``rules`` overrides) over the model axis.
    pp:    stage-stacked ``params["blocks"]`` sharded over the ``pp`` axis
           (GPipe stages resident per device); rest replicated.
    ep:    expert-stacked MoE weights sharded over the ``ep`` axis; rest
           replicated.
    sp:    parameters replicated (sequence-parallel activation sharding
           happens inside modules built with ``seq_axis=``; see
           models.make_pipelined_transformer).
    """
    rep = replicated(mesh)

    def place(tree, shardings):
        return jax.tree_util.tree_map(jax.device_put, tree, shardings)

    out = dict(state)
    if strategy == "sp":
        if "sp" not in mesh.shape:
            raise ValueError(
                "strategy='sp' needs a mesh with an 'sp' axis — pass "
                "EngineConfig(mesh_shape=(('dp', N), ('sp', M))) and build "
                "the module with seq_axis='sp' "
                f"(got axes {tuple(mesh.shape)})"
            )
        return jax.device_put(state, rep)
    if strategy in ("dp", "distributed"):
        return jax.device_put(state, rep)
    if strategy in ("pp", "ep"):
        rules = (_pp_rules if strategy == "pp" else _ep_rules)(state, mesh)
        if rules is None:
            # not a pipelined/MoE module: replicate, as documented — do NOT
            # fall through to tp_shardings' Megatron defaults, which would
            # silently column-shard dense kernels over the dp axis
            return jax.device_put(state, rep)
        strategy = "tp"
    if strategy == "zero":
        for k in ("params", "extra", "grad_acc", "last_grad", "sched_step"):
            if k in out:
                out[k] = jax.device_put(out[k], rep)
        # ZeRO-1 partitions optimizer state over the DATA-parallel axis
        # (the ranks holding the gradient shards), not the model axis a
        # 2-D mesh would otherwise pick by default
        out["opt_state"] = place(
            out["opt_state"], fsdp_shardings(out["opt_state"], mesh,
                                             axis="dp")
        )
        return out
    if strategy in ("fsdp", "tp"):
        shard_fn = fsdp_shardings if strategy == "fsdp" else (
            lambda tree, m: tp_shardings(tree, m, rules=rules)
        )
        for k in ("extra", "sched_step"):
            if k in out:
                out[k] = jax.device_put(out[k], rep)
        for k in ("params", "grad_acc", "last_grad", "opt_state"):
            if k in out:
                out[k] = place(out[k], shard_fn(out[k], mesh))
        return out
    raise ValueError(f"unknown strategy {strategy!r}")


def make_global_batch(local_batch, mesh: Mesh, axis=None):
    """Multi-host: assemble a globally-sharded batch from per-process data
    (replacement for per-rank ``DistributedBatchSampler`` sharding).
    Default axis: ``batch_sharding``'s — ``("dcn", "dp")`` on multi-slice
    meshes, ``"dp"`` otherwise."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def maybe_init_distributed():
    """Join a multi-process JAX cluster when the environment says so.

    Counterpart of the reference's ``dist.init_process_group`` under
    torchrun (``betty/engine.py:166-179``). Two triggers:

    * ``BETTY_COORDINATOR_ADDRESS`` + ``BETTY_NUM_PROCESSES`` +
      ``BETTY_PROCESS_ID`` — explicit cluster spec (used by the 2-process
      CPU test and by hand-rolled launchers);
    * ``JAX_COORDINATOR_ADDRESS`` present — defer to
      ``jax.distributed.initialize()`` auto-detection (TPU pods, SLURM).

    Idempotent: repeated calls (multiple Engines in one process) no-op.
    """
    import os

    if getattr(maybe_init_distributed, "_done", False):
        return
    addr = os.environ.get("BETTY_COORDINATOR_ADDRESS")
    try:
        if addr:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(os.environ["BETTY_NUM_PROCESSES"]),
                process_id=int(os.environ["BETTY_PROCESS_ID"]),
            )
            maybe_init_distributed._done = True
        elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            maybe_init_distributed._done = True
    except RuntimeError as e:  # already initialized by the user
        msg = str(e).lower()
        if ("already initialized" not in msg
                and "only be called once" not in msg):
            raise
        maybe_init_distributed._done = True
