"""Problem: one level of a multilevel optimization program.

Capability parity with reference ``betty/problems/problem.py`` (the 942-LoC
heart of leopard-ai/betty), re-architected for TPU/JAX:

* The reference keeps live ``torch.nn.Module`` / ``torch.optim`` objects and
  mutates them in place. Here a problem's learnable state is an explicit
  pytree (``params / extra / opt_state / grad_acc / last_grad / sched_step``)
  owned by the Engine, and each gradient step is a **pure jitted function**
  ``update(states, batch, path_batches, rng) -> (states, metrics)``.
* The user API stays imperative-feeling: subclass, define
  ``training_step(self, batch)``, call ``self.module(x)`` and other problems
  by name (``self.outer(...)``) exactly as in the reference
  (``problem.py:311-332``, ``engine.py:303-328``). Under the hood these calls
  resolve parameters from a *trace context* so the same user code works both
  inside ``jax.grad``/``jit`` traces and on the host (validation).
* The unroll/step recursion (``step_normal`` / ``step_after_roll_back``,
  reference ``problem.py:371-454``) is preserved verbatim on the host driver;
  the Engine can additionally compile whole unroll blocks to single XLA
  programs (see ``betty_tpu/engine.py``).
* Distributed training needs no module wrapping: gradients of a mean loss
  over a batch sharded across a ``jax.sharding.Mesh`` are globally correct
  because XLA inserts the reductions — the reference's DDP-hook
  ``do_sync`` plumbing (``problem.py:572-581``) has no counterpart here.
"""

import abc
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from betty_tpu.configs import Config
from betty_tpu.module import FunctionalModule, ensure_module
from betty_tpu import utils
from betty_tpu.utils import (
    clip_by_global_norm,
    log_from_loss_dict,
    tree_add,
    tree_cast,
    tree_zeros_like,
)

# ---------------------------------------------------------------------------
# Trace context: maps problem name -> {"params": ..., "extra": ...} while a
# loss function is being traced. ``forward`` resolves parameters here so that
# cross-problem calls (self.outer(...)) are differentiable inputs.
# ---------------------------------------------------------------------------

_TRACE_CTX: Optional[Dict[str, Dict[str, Any]]] = None
_ACTIVE_CAPTURE: Optional[str] = None  # problem whose mutable collections are captured
_CAPTURED_MUTATIONS: Dict[str, Any] = {}
_TRACE_RNG: Optional[jax.Array] = None
_TRACE_RNG_CALLS: int = 0  # per-binding self.rng read counter (see Problem.rng)
_FORCE_FP32: bool = False  # solver_precision="fp32": skip bf16 casts in forward


class force_fp32:
    """Trace-time scope that disables reduced-precision casting in
    ``Problem.forward`` — the hypergradient pipeline's fp32 policy
    (``Config.solver_precision``). Parameters are fp32 masters, so skipping
    the cast makes the wrapped computation exactly fp32."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global _FORCE_FP32
        self._saved = _FORCE_FP32
        if self.enabled:
            _FORCE_FP32 = True
        return self

    def __exit__(self, *exc):
        global _FORCE_FP32
        _FORCE_FP32 = self._saved
        return False


class _CtxBinding:
    def __init__(self, ctx, active: Optional[str], rng=None):
        self.ctx = ctx
        self.active = active
        self.rng = rng

    def __enter__(self):
        global _TRACE_CTX, _ACTIVE_CAPTURE, _TRACE_RNG, _TRACE_RNG_CALLS
        self._saved = (_TRACE_CTX, _ACTIVE_CAPTURE, _TRACE_RNG,
                       _TRACE_RNG_CALLS)
        _TRACE_CTX = self.ctx
        _ACTIVE_CAPTURE = self.active
        _TRACE_RNG = self.rng
        _TRACE_RNG_CALLS = 0  # fresh read sequence per loss evaluation
        return self

    def __exit__(self, *exc):
        global _TRACE_CTX, _ACTIVE_CAPTURE, _TRACE_RNG, _TRACE_RNG_CALLS
        (_TRACE_CTX, _ACTIVE_CAPTURE, _TRACE_RNG,
         _TRACE_RNG_CALLS) = self._saved
        return False


def ctx_replace(ctx, name, params):
    """Functionally replace one problem's params in a context dict."""
    new = dict(ctx)
    entry = dict(new[name])
    entry["params"] = params
    new[name] = entry
    return new


def _collect_cross_ctx(post_ctx, base_ctx, own_name):
    """Entries a traced hook edited on problems OTHER than its owner
    (``set_params``/``set_extra`` replace entry dicts, so identity tells
    edited from untouched)."""
    if post_ctx is None or post_ctx is base_ctx:
        return {}
    return {
        name: entry
        for name, entry in post_ctx.items()
        if name != own_name and entry is not base_ctx.get(name)
    }


# ---------------------------------------------------------------------------


class _ModuleProxy:
    """What ``self.module`` returns inside ``training_step``: calling it runs
    the problem's apply function with context-resolved parameters."""

    def __init__(self, problem: "Problem"):
        self._problem = problem

    def __call__(self, *args, **kwargs):
        return self._problem.forward(*args, **kwargs)


class Problem(abc.ABC):
    """Base class for one optimization level.

    Constructor signature mirrors the reference (``problem.py:29-44``):
    ``module`` is a :class:`betty_tpu.module.FunctionalModule` (or
    ``(apply_fn, params)`` pair), ``optimizer`` a
    :class:`betty_tpu.optim.Optimizer`, ``train_data_loader`` any iterable of
    batches (or list of iterables for multi-loader problems).
    """

    def __init__(
        self,
        name: str,
        config: Optional[Config] = None,
        module=None,
        optimizer=None,
        scheduler: Optional[Callable] = None,
        train_data_loader=None,
        extra_config=None,
    ):
        self._name = name
        self._config = config if config is not None else Config()
        self.cfg = extra_config

        # graph links (reference problem.py:56-59)
        self._parents: List["Problem"] = []
        self._children: List["Problem"] = []
        self._paths: List[List["Problem"]] = []

        # data loaders
        self.train_data_loader = train_data_loader
        self.train_data_iterator = None
        self.epoch_counter = None
        self.cur_batch = None

        # module / optimizer
        self._user_module = module
        self.module_fn: Optional[FunctionalModule] = None
        self.optimizer = optimizer
        self.scheduler = scheduler

        # engine wiring
        self._engine = None
        self.logger = None
        self.env = None
        self.leaf = False
        self.device_sharding = None  # NamedSharding for batches (set by Engine)

        # counters & flags (reference problem.py:88-112)
        self._count = 0
        self._global_step = 0
        self.ready: List[bool] = []
        self._inner_loop_start = True
        self._training = True
        self._roll_back = False
        self._first_order = False
        self._needs_last_grad = self._config.type == "sama"

        # precision
        self.precision = self._config.precision
        self.dtype = utils.get_dtype(self.precision)

        # config-derived shorthands (reference problem.py:78-87)
        self.gas = self._config.gradient_accumulation
        self._unroll_steps = self._config.unroll_steps
        self.warmup_steps = self._config.warmup_steps
        self.gradient_clipping = self._config.gradient_clipping
        self.log_step = self._config.log_step

        # roll-back cache (functional: just a reference to the old pytree)
        self._state_cache = None

        # traced-execution scratch
        self._trace_grads = None
        self._meta_mask = None  # optional bool pytree selecting meta-trainable leaves

        # compiled update cache: (apply_update, has_hyper) -> jitted fn
        self._update_fns: Dict[Any, Callable] = {}

        # rng: per-problem stream, derived stably from the problem name
        import zlib

        self._rng_seed = zlib.crc32(name.encode()) & 0x7FFFFFFF
        # host-path rng call counter: distinct key per access within a step
        # (reset when the local step advances), so validation-time dropout
        # does not repeat across calls (VERDICT r2 #8)
        self._host_rng_calls = 0
        self._host_rng_last_count = -1

    # ------------------------------------------------------------------
    # basic properties
    # ------------------------------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    @property
    def config(self) -> Config:
        return self._config

    @property
    def children(self):
        return self._children

    @property
    def parents(self):
        return self._parents

    @property
    def paths(self):
        return self._paths

    @property
    def count(self) -> int:
        return self._count

    # state access ------------------------------------------------------
    @property
    def state(self) -> Dict[str, Any]:
        return self._engine.states[self._name]

    @state.setter
    def state(self, new_state):
        self._engine.states[self._name] = new_state

    @property
    def params(self):
        """Current trainable parameters. Inside a trace this is the live
        traced value; on the host it is the concrete device pytree."""
        if _TRACE_CTX is not None and self._name in _TRACE_CTX:
            return _TRACE_CTX[self._name]["params"]
        return self.state["params"]

    def set_params(self, new_params):
        """Functional parameter mutation; works both inside traces (updates
        the trace context) and on the host (updates engine state). This is
        the counterpart of in-place ``p.data`` mutation in reference hooks
        like ``on_inner_loop_start`` / ``param_callback``."""
        global _TRACE_CTX
        if _TRACE_CTX is not None and self._name in _TRACE_CTX:
            _TRACE_CTX = ctx_replace(_TRACE_CTX, self._name, new_params)
        else:
            st = dict(self.state)
            # copy: hooks often assign another problem's params (MAML warm
            # start); aliased buffers across problems would break donation
            st["params"] = jax.tree_util.tree_map(jnp.copy, new_params)
            self.state = st

    @property
    def grads(self):
        """Accumulated gradients (only meaningful inside ``grad_callback``)."""
        if self._trace_grads is not None:
            return self._trace_grads
        return self.state["grad_acc"]

    def set_grads_value(self, new_grads):
        self._trace_grads = new_grads

    @property
    def rng(self):
        """Per-step PRNG key available inside ``training_step``. On the host
        (validation-time calls) the key advances with the local step AND a
        per-call counter, so repeated accesses within one step (e.g. several
        dropout forwards during validation) each get a fresh key. The call
        counter resets when the local step advances, keeping the sequence
        reproducible per (step, call-index).

        Inside a trace the same rule applies with a per-loss-evaluation
        counter: the FIRST read returns the step key verbatim (bit-compatible
        with single-read programs) and later reads fold the call index, so
        two independent samplings in one training_step are not silently
        correlated. The counter resets at every loss evaluation, so darts'
        +/-eps re-evaluations replay the identical key sequence."""
        if _TRACE_RNG is not None:
            global _TRACE_RNG_CALLS
            idx = _TRACE_RNG_CALLS
            _TRACE_RNG_CALLS = idx + 1
            if idx == 0:
                return _TRACE_RNG
            return jax.random.fold_in(_TRACE_RNG, idx)
        if self._host_rng_last_count != self._count:
            self._host_rng_last_count = self._count
            self._host_rng_calls = 0
        key = jax.random.fold_in(
            jax.random.PRNGKey(self._rng_seed), self._count
        )
        key = jax.random.fold_in(key, self._host_rng_calls)
        self._host_rng_calls += 1
        return key

    # ------------------------------------------------------------------
    # initialization (reference problem.py:114-196)
    # ------------------------------------------------------------------
    def initialize(self, engine):
        self._engine = engine

        # children readiness bitmask (reference problem.py:120)
        self.ready = [False for _ in range(len(self._children))]

        # parents' first_order flags AND-ed (reference problem.py:122-127)
        first_order = []
        for problem in self._parents:
            hgconfig = problem.config
            first_order.append(hgconfig.first_order)
        self._first_order = all(first_order) if first_order else False
        if (
            self._parents
            and not self._first_order
            and not hasattr(self, "replay_unroll")
            and self.logger is not None
        ):
            # the reference would set create_graph=True through this child
            # (problem.py:344-351); here second-order flows only through an
            # IterativeProblem's differentiable replay — say so loudly
            # instead of silently doing nothing
            self.logger.warning(
                f"Problem {self._name!r}: a parent sets first_order=False "
                "but this child is not an IterativeProblem — ITD gradients "
                "through its updates are NOT computed. Use IterativeProblem "
                "for iterative differentiation, or first_order=True with an "
                "implicit solver (darts/cg/neumann/sama)."
            )

        # user configure_* hooks (reference problem.py:139-162)
        if self.is_implemented("configure_train_data_loader"):
            self.train_data_loader = self.configure_train_data_loader()
        if self.is_implemented("configure_module"):
            self._user_module = self.configure_module()
        if self.is_implemented("configure_optimizer"):
            self.optimizer = self.configure_optimizer()
        if self.is_implemented("configure_scheduler"):
            self.scheduler = self.configure_scheduler()

        assert self._user_module is not None, f"Problem {self._name} has no module"
        self.module_fn = ensure_module(self._user_module)

        # data iterators. Same wrapping rule as the reference
        # (problem.py:142-144): a *tuple* is multiple loaders, anything else
        # (list of batches, generator, DataLoader) is one loader.
        if self.train_data_loader is not None:
            if not isinstance(self.train_data_loader, tuple):
                self.train_data_loader = (self.train_data_loader,)
            self.train_data_loader = list(self.train_data_loader)
            # multi-process: each host loads its example shard; the global
            # batch (local_batch x process_count, sharded over dp) is
            # assembled in _convert_batch. Transparent like the reference's
            # DistributedBatchSampler patch (betty/patch/data_loader.py:85).
            if jax.process_count() > 1 and getattr(
                engine.config, "autoshard_data", True
            ):
                from betty_tpu.data import ArrayLoader, shard_loader

                self.train_data_loader = [
                    shard_loader(dl) if isinstance(dl, ArrayLoader) else dl
                    for dl in self.train_data_loader
                ]
                unsharded = [
                    type(dl).__name__ for dl in self.train_data_loader
                    if not isinstance(dl, ArrayLoader)
                ]
                if unsharded:
                    # a non-ArrayLoader serves the SAME batch on every host;
                    # _convert_batch would assemble a global batch of
                    # process_count duplicate copies — loud, because silent
                    # data duplication corrupts gradients
                    from betty_tpu.logging import get_logger

                    get_logger().warning(
                        f"[Betty-TPU] problem {self._name!r}: loaders "
                        f"{unsharded} cannot be auto-sharded across "
                        f"{jax.process_count()} processes — each host will "
                        "contribute an identical local batch (duplicated "
                        "examples in the global batch). Shard these loaders "
                        "per host yourself, or use ArrayLoader."
                    )
            self.train_data_iterator = [iter(dl) for dl in self.train_data_loader]
            self.epoch_counter = [0 for _ in self.train_data_loader]
            # batches consumed within the current epoch, per loader — the
            # handoff cursor between driver iteration and compiled-block
            # fastpath consumption (see compile.BlockRunner.run_block)
            self.batches_served = [0 for _ in self.train_data_loader]
        else:
            # env-driven problems must override get_batch — the default one
            # cannot pull from an Env (reference asserts the same,
            # problem.py:144-145)
            assert type(self).get_batch is not Problem.get_batch, (
                f"Problem {self._name} requires a data loader or a "
                "get_batch override"
            )


    def init_state(self, rng=None) -> Dict[str, Any]:
        """Build the initial state pytree for this problem."""
        variables = dict(self.module_fn.init(rng if rng is not None else jax.random.PRNGKey(0)))

        def strong(x):
            # drop weak types (Python-scalar-derived inits like
            # jnp.zeros/jnp.full): the first optimizer update produces
            # strong-typed params, and a weak->strong aval change would
            # force a FULL second compile of every jitted update
            x = jnp.asarray(x)
            return jnp.asarray(x, dtype=x.dtype)

        variables = jax.tree_util.tree_map(strong, variables)
        params = variables.pop("params")
        extra = variables  # batch_stats etc.
        if self.optimizer is not None and self.is_implemented("param_groups"):
            # per-group hyperparameters (reference problem.py:253-254):
            # the user's optimizer is the template; each group re-instantiates
            # it with overridden kwargs behind optax.multi_transform
            from betty_tpu import optim as _optim

            if not isinstance(self.optimizer, _optim.GroupedOptimizer):
                self.optimizer = _optim.grouped(
                    self.optimizer, self.param_groups(), params
                )
        opt_state = self.optimizer.init(params) if self.optimizer is not None else ()
        state = {
            "params": params,
            "extra": extra,
            "opt_state": opt_state,
            "grad_acc": tree_zeros_like(params),
            "sched_step": jnp.zeros((), dtype=jnp.int32),
        }
        if self._needs_last_grad:
            state["last_grad"] = tree_zeros_like(params)
        return state

    # ------------------------------------------------------------------
    # forward / loss (reference problem.py:311-332, 496-519)
    # ------------------------------------------------------------------
    @property
    def module(self):
        return _ModuleProxy(self)

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def forward(self, *args, **kwargs):
        """Apply this problem's module with context-resolved parameters."""
        if _TRACE_CTX is not None and self._name in _TRACE_CTX:
            entry = _TRACE_CTX[self._name]
            params, extra = entry["params"], entry["extra"]
        else:
            st = self.state
            params, extra = st["params"], st["extra"]

        variables = {"params": params, **extra}
        if self.precision in ("fp16", "bf16") and not _FORCE_FP32:
            variables = tree_cast(variables, self.dtype)
            args = tuple(tree_cast(a, self.dtype) for a in args)
            kwargs = {k: tree_cast(v, self.dtype) for k, v in kwargs.items()}

        rngs = None
        if self._training:
            # one per-step key per rng collection the module consumes; the
            # first name keeps the step key itself (bit-compatible with the
            # historical dropout-only behavior), later names get stable
            # folds. Traced: the step key. Host (train-mode forwards inside
            # hooks like on_inner_loop_start): the per-(step, call) host key
            # — rngs=None here crashed any rng-consuming module.
            from betty_tpu.utils import fold_rng_name

            step_key = _TRACE_RNG if _TRACE_RNG is not None else self.rng
            names = getattr(self.module_fn, "rng_names", ("dropout",))
            rngs = {
                name: step_key if i == 0 else fold_rng_name(step_key, name)
                for i, name in enumerate(names)
            }
        mutable = self.module_fn.mutable_collections if self._training else ()
        if mutable:
            # train-mode BatchNorm etc. must be allowed to write its
            # collections; the update is kept only when this problem is the
            # one whose own loss is being evaluated (reference semantics:
            # only the problem's own step updates its running stats)
            out, mutated = self.module_fn.apply(
                variables, *args, train=self._training, rngs=rngs,
                mutable=mutable, **kwargs
            )
            if (
                _ACTIVE_CAPTURE == self._name
                and self._name not in _CAPTURED_MUTATIONS
            ):
                # first forward wins: running stats update once per step, and
                # forwards inside nested transforms (jvp/grad regularizers in
                # the user loss) must not leak their inner tracers out
                _CAPTURED_MUTATIONS[self._name] = mutated
            return out
        out = self.module_fn.apply(
            variables, *args, train=self._training, rngs=rngs, mutable=(), **kwargs
        )
        return out

    @abc.abstractmethod
    def training_step(self, batch):
        """User-defined loss. Return a scalar loss or a dict with key "loss"
        (reference ``problem.py:320-325``)."""
        raise NotImplementedError

    def training_step_exec(self, batch):
        # bf16 compute happens inside ``forward`` via parameter/input casting;
        # no autocast context is needed (reference problem.py:327-332).
        return self.training_step(batch)

    def eval_loss(self, ctx, batch, rng=None, capture: bool = False):
        """Pure evaluation of this problem's training loss on a context.

        Returns ``(loss_fp32, loss_dict, mutated_collections)``.
        """
        global _CAPTURED_MUTATIONS
        saved_mut = _CAPTURED_MUTATIONS
        _CAPTURED_MUTATIONS = {}
        try:
            with _CtxBinding(ctx, self._name if capture else None, rng):
                maybe_loss_dict = self.training_step_exec(batch)
            mutated = _CAPTURED_MUTATIONS.get(self._name, None)
        finally:
            _CAPTURED_MUTATIONS = saved_mut
        is_dict = isinstance(maybe_loss_dict, dict)
        loss = maybe_loss_dict["loss"] if is_dict else maybe_loss_dict
        loss = jnp.asarray(loss)
        if loss.dtype == jnp.bfloat16 or loss.dtype == jnp.float16:
            loss = loss.astype(jnp.float32)  # bf16 compute, fp32 reduction
        loss_dict = {"loss": loss}
        if is_dict:
            for key, value in maybe_loss_dict.items():
                if key != "loss":
                    loss_dict[key] = value
        return loss, loss_dict, mutated

    # ------------------------------------------------------------------
    # meta-trainable parameter filtering
    # (reference meta_trainable_parameters, problem.py:848-854)
    # ------------------------------------------------------------------
    def set_meta_mask(self, mask):
        """Restrict which parameter leaves participate in hypergradients.
        ``mask`` is a bool pytree matching ``params`` (True = meta-trainable)."""
        self._meta_mask = mask

    def meta_filter_grad(self, grad):
        if self._meta_mask is None:
            return grad
        return jax.tree_util.tree_map(
            lambda m, g: jnp.where(m, g, jnp.zeros_like(g)), self._meta_mask, grad
        )

    # ------------------------------------------------------------------
    # the pure update function (reference one_step_descent + backward,
    # problem.py:334-369, 521-597)
    # ------------------------------------------------------------------
    def build_update_fn(self, apply_update: bool, advance_sched: bool = True) -> Callable:
        """Build the pure per-step update: direct grad + hypergradient paths
        + (at accumulation boundaries) optimizer step.

        ``states`` maps every problem name to its state pytree; ``batch`` is
        this problem's batch; ``path_batches`` maps each intermediate problem
        on this problem's paths to its current batch (the reference's
        ``curr.cur_batch`` used inside solvers, e.g. ``darts.py:39``).
        """
        from betty_tpu.hypergradient import compute_path_grads

        problem = self

        # ITD children: gradient flows through their unrolled updates via a
        # differentiable replay (see betty_tpu/problems/iterative.py). The
        # reference's counterpart is create_graph=True on the child's inner
        # updates when a parent sets first_order=False (problem.py:344-351).
        itd_children = [
            c
            for c in self._children
            if hasattr(c, "replay_unroll") and not c._first_order
        ]

        # one backward pass serves both the direct gradient and every path's
        # starting vector v = d(loss)/d(child params) — the loss is the same
        # function; two jax.grad calls would run its backward twice. The
        # joint pass is skipped only when a precision split forces separate
        # evaluations (bf16 training step + fp32 solver pipeline).
        has_paths = problem._config.first_order and len(problem._paths) > 0
        path_children = {}
        if has_paths:
            for path in problem._paths:
                path_children[path[1].name] = path[1]
        itd_names = {c.name for c in itd_children}
        # v = d(loss)/d(child params) must be exactly fp32 under
        # solver_precision="fp32"; the joint pass runs WITHOUT force_fp32,
        # so skip it when ANY forward on the loss path would cast to reduced
        # precision — this problem's or a path child's (the loss calls the
        # child's forward, which casts by the CHILD's precision)
        reduced_precision = problem.precision in ("fp16", "bf16") or any(
            ch.precision in ("fp16", "bf16") for ch in path_children.values()
        )
        joint_v = (
            has_paths
            and not (
                reduced_precision
                and problem._config.solver_precision == "fp32"
            )
            # an ITD replay would shadow the child-params substitution
            and not (set(path_children) & itd_names)
        )
        # NOTE on gradient-reduction precision (multi-chip dp/zero/fsdp):
        # no in-framework cast is needed — the TPU backend already sinks
        # the SPMD gradient all-reduce below the narrowing convert when the
        # forward computes in bf16, so under precision="bf16" gradient
        # reductions ride the ICI wire in bf16 automatically (verified on
        # the v5e:2x4-topology-compiled north-star programs; a bf16-cast
        # differentiation point was prototyped and measured to change
        # nothing — scripts/ici_analysis.py --target tpu, BASELINE.md).

        def update(states, batch, path_batches, itd_data, rng):
            ctx = {
                name: {"params": s["params"], "extra": s["extra"]}
                for name, s in states.items()
            }
            gas = float(problem.gas)

            def direct_loss(own_params, child_params):
                c = ctx_replace(ctx, problem._name, own_params)
                for name, cp in child_params.items():
                    c = ctx_replace(c, name, cp)
                for ch in itd_children:
                    c = ctx_replace(
                        c, ch.name, ch.replay_unroll(c, itd_data[ch.name], rng)
                    )
                loss, loss_dict, mutated = problem.eval_loss(
                    c, batch, rng=rng, capture=True
                )
                return loss / gas, (loss_dict, mutated)

            if problem._config.remat:
                # recompute activations in the backward pass instead of
                # storing them (jax.checkpoint): FLOPs for HBM
                direct_loss = jax.checkpoint(direct_loss)

            child_args = (
                {name: ctx[name]["params"] for name in path_children}
                if joint_v else {}
            )
            (_, (loss_dict, mutated)), grad_out = jax.value_and_grad(
                direct_loss, argnums=(0, 1) if joint_v else 0, has_aux=True
            )(ctx[problem._name]["params"], child_args)
            if joint_v:
                dgrad, v_by_child = grad_out
            else:
                dgrad, v_by_child = grad_out, None

            grads = dgrad
            # indirect grad: best-response Jacobian chain, gated on this
            # problem's own first_order flag (reference problem.py:573)
            if has_paths:
                hyper = compute_path_grads(
                    problem, ctx, states, batch, path_batches, rng, gas,
                    v_by_child=v_by_child,
                )
                grads = tree_add(grads, hyper)

            state = dict(states[problem._name])
            state["grad_acc"] = tree_add(state["grad_acc"], grads)
            if mutated:
                if problem.precision in ("fp16", "bf16"):
                    mutated = tree_cast(mutated, jnp.float32)
                state["extra"] = {**state["extra"], **mutated}

            # grad_callback hook: after EVERY micro-step, on the running
            # accumulation (reference problem.py:352-354 fires it after each
            # backward, before the accumulation-boundary check)
            cross_updates = {}
            if problem.is_implemented("grad_callback"):
                problem._trace_grads = state["grad_acc"]
                hook_ctx = dict(ctx)
                hook_ctx[problem._name] = {"params": state["params"],
                                           "extra": state["extra"]}
                with _CtxBinding(hook_ctx, None, rng):
                    problem.grad_callback()
                    cross_updates.update(_collect_cross_ctx(
                        _TRACE_CTX, hook_ctx, problem._name))
                state["grad_acc"] = problem._trace_grads
                problem._trace_grads = None

            if apply_update:
                state, cross = problem._apply_optimizer(state, ctx, rng)
                cross_updates.update(cross)

            # per-inner-step scheduler counter. Reference semantics
            # (problem.py:391-392, 426-428): with roll_back the scheduler is
            # NOT stepped during the unroll, only once per roll-back re-step.
            if advance_sched:
                state["sched_step"] = state["sched_step"] + 1

            new_states = dict(states)
            # hooks may set_params/extra on OTHER problems (reference hooks
            # mutate modules in place); merge those context edits back
            for name, entry in cross_updates.items():
                ns = dict(new_states[name])
                ns["params"] = entry["params"]
                ns["extra"] = entry["extra"]
                new_states[name] = ns
            new_states[problem._name] = state
            return new_states, loss_dict

        return update

    def _apply_optimizer(self, state, ctx, rng):
        """Optimizer step at a gradient-accumulation boundary
        (reference ``implicit_problem.py:40-65``). Returns
        ``(new_state, cross_updates)`` where ``cross_updates`` carries
        params/extra that a traced ``param_callback`` set on OTHER problems
        (discarding them silently was a bug — the reference's hooks mutate
        modules in place, any module)."""
        grads = state["grad_acc"]

        def self_ctx(cur_state):
            """ctx with this problem's entry refreshed from the live state
            (params post-update, extra incl. mutated collections)."""
            new = {k: dict(v) for k, v in ctx.items()}
            new[self._name] = {
                "params": cur_state["params"],
                "extra": cur_state["extra"],
            }
            return new

        cross_updates = {}
        if self.gradient_clipping > 0.0:
            grads = clip_by_global_norm(grads, self.gradient_clipping)

        if self.is_implemented("custom_optimizer_step"):
            new_params = self.custom_optimizer_step(state["params"], grads, state)
            new_opt_state = state["opt_state"]
        else:
            updates, new_opt_state = self.optimizer.update(
                grads, state["opt_state"], state["params"],
                sched_step=state["sched_step"],
            )
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state["params"], updates
            )

        state = dict(state)
        state["params"] = new_params
        state["opt_state"] = new_opt_state
        if self._needs_last_grad:
            # SAMA caches the gradient used for this step
            # (reference implicit_problem.py:51-55)
            state["last_grad"] = grads

        # param_callback hook (reference problem.py:359-361), traced; may
        # mutate params (clamping) and/or extra collections (EMA teachers),
        # on this problem or on others (cross edits returned to the caller)
        if self.is_implemented("param_callback"):
            global _TRACE_CTX
            base = self_ctx(state)
            with _CtxBinding(base, None, rng):
                self.param_callback()
                state["params"] = _TRACE_CTX[self._name]["params"]
                state["extra"] = _TRACE_CTX[self._name]["extra"]
                cross_updates.update(
                    _collect_cross_ctx(_TRACE_CTX, base, self._name))

        state["grad_acc"] = tree_zeros_like(state["grad_acc"])
        return state, cross_updates

    def _get_update_fn(self, apply_update: bool, advance_sched: bool = True) -> Callable:
        key = (bool(apply_update), bool(advance_sched))
        if key not in self._update_fns:
            fn = self.build_update_fn(apply_update=key[0], advance_sched=key[1])
            # Donate the states dict (halves transient HBM: params, grads and
            # optimizer moments update in place) — unless some problem holds
            # references to old state pytrees (roll-back caches, ITD unroll
            # starts), which donation would invalidate.
            donate = ()
            if self._engine is not None and self._engine.config.donate_state:
                holds_refs = any(
                    p._roll_back or hasattr(p, "replay_unroll")
                    for p in self._engine.problems
                )
                if not holds_refs:
                    donate = (0,)
            self._update_fns[key] = jax.jit(fn, donate_argnums=donate)
        return self._update_fns[key]

    # ------------------------------------------------------------------
    # one step descent (host driver; reference problem.py:334-369)
    # ------------------------------------------------------------------
    def one_step_descent(self, batch=None, advance_sched=None):
        if batch is None:
            self.cur_batch = self.get_batch()
            batch = self.cur_batch
        if advance_sched is None:
            advance_sched = not self._roll_back

        apply_update = self._count % self.gas == 0
        path_batches = {
            p.name: p.cur_batch for p in self._path_intermediates()
        }
        itd_data = {
            c.name: c.get_unroll_data()
            for c in self._children
            if hasattr(c, "replay_unroll") and not c._first_order
        }
        rng = jax.random.fold_in(
            jax.random.PRNGKey(self._rng_seed), self._count
        )
        update_fn = self._get_update_fn(apply_update, advance_sched)
        new_states, loss_dict = update_fn(
            self._engine.states, batch, path_batches, itd_data, rng
        )
        self._engine.states = new_states
        return loss_dict

    def _path_intermediates(self):
        seen = {}
        for path in self._paths:
            for q in path[1:-1]:
                seen[q.name] = q
        return list(seen.values())

    # ------------------------------------------------------------------
    # step recursion — semantics identical to reference problem.py:371-454
    # ------------------------------------------------------------------
    def step_normal(self, global_step=None):
        if self.check_ready():
            if self._inner_loop_start:
                if self.is_implemented("on_inner_loop_start"):
                    self.on_inner_loop_start()
                self._inner_loop_start = False
                if self._roll_back:
                    self.cache_states()

            if self._training:
                self._count += 1

            loss_dict = self.one_step_descent()

            if (
                self.log_step > 0
                and self._count % self.log_step == 0
                and self.is_rank_zero()
            ):
                self.log(loss_dict, global_step)

            if (
                self._training
                and self._count % (self._unroll_steps * self.gas) == 0
                and self._count > self.warmup_steps
            ):
                for problem in self._parents:
                    idx = problem.children.index(self)
                    problem.ready[idx] = True
                    problem.step_normal(global_step=global_step)
                self._inner_loop_start = True

            self.ready = [False for _ in range(len(self._children))]

    def step_after_roll_back(self):
        if self.check_ready() and self._training:
            if self._roll_back:
                self.recover_states()
                _ = self.one_step_descent(batch=self.cur_batch, advance_sched=True)
                for problem in self._parents:
                    idx = problem.children.index(self)
                    problem.ready[idx] = True
                    problem.step_after_roll_back()
            self.ready = [False for _ in range(len(self._children))]

    def step(self, global_step=None):
        self._global_step = global_step
        self.step_normal(global_step=global_step)
        if (
            self._count % (self._unroll_steps * self.gas) == 0
            and self._count > self.warmup_steps
        ):
            self.step_after_roll_back()

    # ------------------------------------------------------------------
    # data loading (reference problem.py:456-494)
    # ------------------------------------------------------------------
    def get_batch(self):
        batch = tuple(
            self.get_batch_single_loader(i)
            for i in range(len(self.train_data_loader))
        )
        return batch[0] if len(batch) == 1 else batch

    def get_batch_single_loader(self, idx):
        data_iterator = self.train_data_iterator[idx]
        try:
            batch = next(data_iterator)
            self.batches_served[idx] += 1
        except StopIteration:
            if idx == 0:
                self.epoch_callback_exec()
            self.epoch_counter[idx] += 1
            train_data_loader = self.train_data_loader[idx]
            if hasattr(train_data_loader, "set_epoch"):
                train_data_loader.set_epoch(self.epoch_counter[idx])
            self.train_data_iterator[idx] = iter(train_data_loader)
            batch = next(self.train_data_iterator[idx])
            self.batches_served[idx] = 1
        return self._convert_batch(batch)

    def _convert_batch(self, batch):
        import numpy as np

        if getattr(self, "_batch_to_host", False):
            # block-mode staging: keep host batches on the host (the runner
            # stacks a whole block and ships it in one transfer); batches
            # that are ALREADY device-resident (ArrayLoader(device=True))
            # stay on device — downloading them would defeat the point
            def put(x):
                if isinstance(x, jax.Array):
                    return x
                return np.asarray(x)
        elif jax.process_count() > 1 and self.device_sharding is not None:
            # multi-host: this process's local batch is one shard of the
            # global batch (global size = local x process_count, sharded
            # over dp across all hosts)
            def put(x):
                return jax.make_array_from_process_local_data(
                    self.device_sharding, np.asarray(x)
                )
        else:
            def put(x):
                arr = jnp.asarray(x) if not isinstance(x, jax.Array) else x
                if self.device_sharding is not None:
                    arr = jax.device_put(arr, self.device_sharding)
                return arr

        converted = jax.tree_util.tree_map(put, batch)  # any nesting
        if isinstance(converted, list):
            return tuple(converted)
        return converted

    def epoch_callback_exec(self):
        if self.is_implemented("epoch_callback"):
            self.epoch_callback()

    # ------------------------------------------------------------------
    # roll-back cache: free in a functional setting
    # (reference deepcopy-based cache, implicit_problem.py:67-78)
    # ------------------------------------------------------------------
    def cache_states(self):
        self._state_cache = self.state  # immutable pytree: reference suffices

    def recover_states(self):
        # A problem whose window hasn't re-cached (e.g. an upper reached
        # only through a roll-back cascade, or a second recovery before
        # the next inner_loop_start) has nothing cached: the state RESTORE
        # is skipped — but note step_after_roll_back still runs the
        # re-step afterwards, so a real update (on a fresh batch when
        # cur_batch is None) is applied either way. Compiled-block mode
        # reproduces exactly this via its carried cache-validity flags
        # (compile.py). The reference crashes here instead:
        # load_state_dict(None), implicit_problem.py:73.
        if self._state_cache is None:
            return
        self.state = self._state_cache
        self._state_cache = None

    # ------------------------------------------------------------------
    # misc parity helpers
    # ------------------------------------------------------------------
    def check_ready(self) -> bool:
        """All children reported (reference problem.py:758-766)."""
        return all(self.ready)

    def gradient_accumulation_boundary(self) -> bool:
        return bool(self._count % self.gas == 0)

    def state_dict(self) -> Dict[str, Any]:
        """Whole-problem state as a host pytree (reference problem.py:638-653).
        Orbax-serializable."""
        return jax.device_get(self.state)

    def load_state_dict(self, state_dict):
        st = self.state
        cur_def = jax.tree_util.tree_structure(st)
        new_def = jax.tree_util.tree_structure(state_dict)
        if cur_def != new_def:
            raise ValueError(
                f"load_state_dict for problem {self._name!r}: state structure "
                f"mismatch — the checkpoint was saved from a differently-"
                f"configured problem (e.g. other optimizer/solver/module).\n"
                f"  current:    {cur_def}\n  checkpoint: {new_def}"
            )
        for cur, new in zip(jax.tree_util.tree_leaves(st),
                            jax.tree_util.tree_leaves(state_dict)):
            if hasattr(cur, "shape") and tuple(cur.shape) != tuple(
                jnp.shape(new)
            ):
                raise ValueError(
                    f"load_state_dict for problem {self._name!r}: leaf shape "
                    f"mismatch {tuple(jnp.shape(new))} vs expected "
                    f"{tuple(cur.shape)}"
                )
        self.state = jax.tree_util.tree_map(
            lambda cur, new: jax.device_put(
                jnp.asarray(new, dtype=cur.dtype), cur.sharding
            ),
            st,
            state_dict,
        )

    def log(self, stats, global_step):
        loss_log = log_from_loss_dict(stats)
        if self.logger is not None:
            self.logger.info(
                f'[Problem "{self._name}"] [Global Step {global_step}] '
                f"[Local Step {self._count}] {loss_log}"
            )
            cur_step = self._count if self._config.log_local_step else global_step
            self.logger.log(stats, tag=self._name, step=cur_step)

    def add_child(self, problem: "Problem"):
        assert problem is not self
        self._children.append(problem)

    def add_parent(self, problem: "Problem"):
        assert problem is not self
        self._parents.append(problem)

    def add_paths(self, paths):
        self._paths.extend(paths)

    def add_logger(self, logger):
        self.logger = logger

    def add_env(self, env):
        self.env = env

    def clear_dependencies(self):
        self._children = []
        self._parents = []
        self._paths = []
        self._update_fns = {}

    def is_implemented(self, fn_name: str) -> bool:
        return callable(getattr(self, fn_name, None))

    def is_rank_zero(self) -> bool:
        return jax.process_index() == 0

    def train(self):
        self._training = True

    def eval(self):
        self._training = False

    # parity aliases (reference problem.py:836-854)
    def parameters(self):
        return self.params

    def trainable_parameters(self):
        return self.params

    def meta_trainable_parameters(self):
        if self._meta_mask is None:
            return self.params
        return self.meta_filter_grad(self.params)
