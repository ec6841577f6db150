"""Optimizers.

The reference uses ``torch.optim`` plus hand-written out-of-place
"differentiable" re-implementations for the ITD path (``betty/optim/*``,
~270 LoC). In JAX every optax update is already a pure, differentiable
function of ``(grads, opt_state, params)``, so one wrapper serves both the
AID (implicit) and ITD (iterative) paths.

``Optimizer`` matches torch semantics exactly (verified against torch.optim
in tests/test_optim.py):

* sgd: momentum buffer b = mu*b + g, update = -lr*b (nesterov supported)
* adam: bias-corrected, eps outside sqrt — identical to torch.optim.Adam
* adamw: decoupled weight decay — identical to torch.optim.AdamW

It also exposes Adam moments (``mu``/``nu``) for the SAMA solver's
preconditioner (counterpart of the reference's reconstruction from live
torch optimizer state, ``betty/hypergradient/utils.py:37-63``) and supports a
per-step learning-rate schedule (counterpart of
``betty/patch/scheduler.py``)."""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class Optimizer:
    """An optax GradientTransformation tagged with metadata betty_tpu needs.

    ``schedule``: optional ``f(step) -> lr`` evaluated at every *optimizer*
    step (the reference steps its LR scheduler once per inner step;
    pass the schedule here and it is applied on the same cadence via
    ``sched_step`` threading in the problem update).
    """

    def __init__(
        self,
        tx: optax.GradientTransformation,
        kind: str = "custom",
        lr: float = None,
        betas: Tuple[float, float] = (0.9, 0.999),
        eps: float = 1e-8,
        schedule: Optional[Callable] = None,
    ):
        self.tx = tx
        self.kind = kind
        self.lr = lr
        self.betas = betas
        self.eps = eps
        self.schedule = schedule

    def init(self, params):
        return self.tx.init(params)

    def update(self, grads, opt_state, params, sched_step=None):
        """One optimizer update. If a schedule is attached and the tx was
        built with ``inject_hyperparams`` (the factory functions below do
        this automatically when needed), the learning rate for this step is
        ``schedule(sched_step)``."""
        if self.schedule is not None and sched_step is not None:
            opt_state, found = set_injected_lr(
                opt_state, self.schedule(sched_step), report=True
            )
            if not found:
                raise ValueError(
                    "An LR schedule is attached but the optimizer state has "
                    "no inject_hyperparams learning rate to drive — the "
                    "schedule would be silently ignored. Build the tx with "
                    "optax.inject_hyperparams (the betty_tpu.optim factories "
                    "do this automatically when schedule= is passed), or "
                    "wrap the schedule into the transform itself."
                )
        updates, new_state = self.tx.update(grads, opt_state, params)
        return updates, new_state

    # ---- SAMA support: locate Adam first/second moments in opt_state ----
    def adam_moments(self, opt_state):
        found = find_adam_state(opt_state)
        if found is None:
            raise ValueError(
                "SAMA preconditioning requires an Adam-family optimizer "
                "(no ScaleByAdamState found in opt_state)."
            )
        return found.mu, found.nu


def find_adam_state(state):
    """Recursively locate an ``optax.ScaleByAdamState`` in a (possibly nested)
    opt_state tuple."""
    if isinstance(state, optax.ScaleByAdamState):
        return state
    if hasattr(state, "inner_state"):
        return find_adam_state(state.inner_state)
    if isinstance(state, (tuple, list)):
        for s in state:
            r = find_adam_state(s)
            if r is not None:
                return r
    return None


def set_injected_lr(opt_state, lr, report: bool = False):
    """Set the learning rate inside an ``optax.inject_hyperparams`` state.
    With ``report=True`` also returns whether any injection point was found
    (callers use it to fail loudly instead of silently ignoring a
    schedule)."""
    found = [False]

    def _set(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            found[0] = True
            hp = dict(state.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
            return state._replace(hyperparams=hp)
        if isinstance(state, tuple) and type(state) is not tuple:  # NamedTuple
            return state
        if isinstance(state, tuple):
            return tuple(_set(s) for s in state)
        return state

    new_state = _set(opt_state)
    if report:
        return new_state, found[0]
    return new_state


class GroupedOptimizer(Optimizer):
    """Per-parameter-group hyperparameters (counterpart of the reference's
    ``param_groups`` hook, ``betty/problems/problem.py:253-254`` — torch
    optimizers carry per-group lr/momentum; here each group is its own
    optax transform behind ``optax.multi_transform``).

    ``group_schedules``: per-group-label LR schedules (None = static lr).
    """

    def __init__(self, tx, base: Optimizer, group_schedules, labels=None,
                 group_meta=None):
        super().__init__(tx, kind=base.kind, lr=base.lr, betas=base.betas,
                         eps=base.eps, schedule=base.schedule)
        self.group_schedules = group_schedules
        self.labels = labels          # per-leaf group label pytree
        self.group_meta = group_meta  # {label: {"lr","betas","eps","schedule"}}

    def adam_moments(self, opt_state):
        """Merge per-group Adam moments back into full parameter-shaped
        trees (optax.masked fills non-member leaves with MaskedNode) so
        SAMA preconditioning works across groups."""
        from optax import MaskedNode

        mus, nus = [], []
        for label, st in opt_state.inner_states.items():
            inner = st.inner_state if hasattr(st, "inner_state") else st
            found = find_adam_state(inner)
            if found is None:
                raise ValueError(
                    "SAMA preconditioning with param_groups requires every "
                    f"group to be Adam-family; group {label} is not."
                )
            mus.append(found.mu)
            nus.append(found.nu)

        is_node = lambda x: isinstance(x, MaskedNode)  # noqa: E731

        def merge(*leaves):
            real = [x for x in leaves if not isinstance(x, MaskedNode)]
            assert len(real) == 1, "param groups must partition the leaves"
            return real[0]

        mu = jax.tree_util.tree_map(merge, *mus, is_leaf=is_node)
        nu = jax.tree_util.tree_map(merge, *nus, is_leaf=is_node)
        return mu, nu

    def leaf_hyperparam_trees(self, sched_step):
        """Per-leaf (lr, beta1, beta2, eps) trees for SAMA preconditioning —
        the counterpart of the reference's per-param_group reads
        (``hypergradient/utils.py:45-61``)."""

        def of(key):
            def leaf(label):
                m = self.group_meta[label]
                if key == "lr":
                    return (m["schedule"](sched_step)
                            if m["schedule"] is not None else m["lr"])
                if key == "b1":
                    return m["betas"][0]
                if key == "b2":
                    return m["betas"][1]
                return m["eps"]

            return jax.tree_util.tree_map(leaf, self.labels)

        return of("lr"), of("b1"), of("b2"), of("eps")

    def update(self, grads, opt_state, params, sched_step=None):
        if sched_step is not None and any(
            s is not None for s in self.group_schedules.values()
        ):
            inner = dict(opt_state.inner_states)
            for label, sched in self.group_schedules.items():
                if sched is not None:
                    st = inner[label]
                    if hasattr(st, "inner_state"):  # optax MaskedState
                        st = st._replace(
                            inner_state=set_injected_lr(
                                st.inner_state, sched(sched_step)
                            )
                        )
                    else:
                        st = set_injected_lr(st, sched(sched_step))
                    inner[label] = st
            opt_state = opt_state._replace(inner_states=inner)
        return self.tx.update(grads, opt_state, params)


def _leaf_path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "name", k))) for k in path
    )


def grouped(base: Optimizer, groups, params) -> GroupedOptimizer:
    """Build a per-group optimizer from the user's ``param_groups()`` spec.

    ``groups``: a list of dicts; ``"select"`` is a path regex matched against
    each parameter leaf's pytree path (``None`` = catch-all), remaining keys
    override the base optimizer's constructor kwargs (``lr``, ``momentum``,
    ``weight_decay``, ...). First matching group wins — mirror of torch's
    explicit param lists. A base ``schedule`` applies to every group scaled
    to its lr (torch LR schedulers decay each group proportionally); a
    per-group ``"schedule"`` overrides it.
    """
    import re

    import jax

    if getattr(base, "_ctor", None) is None:
        raise ValueError(
            "param_groups requires a betty_tpu.optim factory optimizer "
            "(sgd/adam/adamw) as the template; got a raw optax transform"
        )
    fn, base_kw = base._ctor
    txs, schedules, group_meta = {}, {}, {}
    for i, g in enumerate(groups):
        kw = dict(base_kw)
        kw.update({k: v for k, v in g.items() if k not in ("select", "schedule")})
        sched = g.get("schedule")
        if sched is None and base.schedule is not None:
            g_lr, b_lr, b_sched = kw.get("lr", base.lr), base.lr, base.schedule
            sched = lambda step, _g=g_lr, _b=b_lr, _s=b_sched: _g * _s(step) / _b
        if sched is not None:
            kw["schedule"] = sched
        txs[i] = fn(**kw).tx
        schedules[i] = sched
        group_meta[i] = {
            "lr": kw.get("lr", base.lr),
            "betas": kw.get("betas", base.betas),
            "eps": kw.get("eps", base.eps),
            "schedule": sched,
        }

    compiled = [
        (re.compile(g["select"]) if g.get("select") else None) for g in groups
    ]

    def label_for(path, _x):
        pstr = _leaf_path_str(path)
        for i, pat in enumerate(compiled):
            if pat is None or pat.search(pstr):
                return i
        raise ValueError(
            f"param_groups: no group matches parameter {pstr!r}; add a "
            f"catch-all group with select=None"
        )

    labels = jax.tree_util.tree_map_with_path(label_for, params)
    return GroupedOptimizer(optax.multi_transform(txs, labels), base,
                            schedules, labels=labels, group_meta=group_meta)


def _maybe_inject(factory, schedule, static=(), **kwargs):
    if schedule is not None:
        # only the learning rate is schedule-injected; everything else stays
        # a Python constant (some are used in `if` branches at build time)
        return optax.inject_hyperparams(factory, static_args=static)(**kwargs)
    return factory(**kwargs)


def sgd(lr: float, momentum: float = 0.0, weight_decay: float = 0.0,
        nesterov: bool = False, schedule: Optional[Callable] = None) -> Optimizer:
    """torch.optim.SGD-equivalent."""

    def factory(learning_rate, momentum=momentum, weight_decay=weight_decay,
                nesterov=nesterov):
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
        parts.append(optax.scale(-1.0))
        parts.append(optax.scale_by_learning_rate(learning_rate, flip_sign=False))
        return optax.chain(*parts)

    tx = _maybe_inject(factory, schedule,
                       static=("momentum", "weight_decay", "nesterov"),
                       learning_rate=lr)
    opt = Optimizer(tx, kind="sgd", lr=lr, schedule=schedule)
    opt._ctor = (sgd, dict(lr=lr, momentum=momentum, weight_decay=weight_decay,
                           nesterov=nesterov, schedule=schedule))
    return opt


def adam(lr: float, betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0, schedule: Optional[Callable] = None) -> Optimizer:
    """torch.optim.Adam-equivalent (L2 weight decay folded into the gradient)."""

    def factory(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                weight_decay=weight_decay):
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        parts.append(optax.scale(-1.0))
        parts.append(optax.scale_by_learning_rate(learning_rate, flip_sign=False))
        return optax.chain(*parts)

    tx = _maybe_inject(factory, schedule,
                       static=("b1", "b2", "eps", "weight_decay"),
                       learning_rate=lr)
    opt = Optimizer(tx, kind="adam", lr=lr, betas=betas, eps=eps, schedule=schedule)
    opt._ctor = (adam, dict(lr=lr, betas=betas, eps=eps,
                            weight_decay=weight_decay, schedule=schedule))
    return opt


def adamw(lr: float, betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.01, schedule: Optional[Callable] = None) -> Optimizer:
    """torch.optim.AdamW-equivalent (decoupled weight decay)."""

    def factory(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                weight_decay=weight_decay):
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale(-1.0),
            optax.scale_by_learning_rate(learning_rate, flip_sign=False),
        )

    tx = _maybe_inject(factory, schedule,
                       static=("b1", "b2", "eps", "weight_decay"),
                       learning_rate=lr)
    opt = Optimizer(tx, kind="adam", lr=lr, betas=betas, eps=eps, schedule=schedule)
    opt._ctor = (adamw, dict(lr=lr, betas=betas, eps=eps,
                             weight_decay=weight_decay, schedule=schedule))
    return opt


def from_optax(tx: optax.GradientTransformation, kind: str = "custom",
               **meta) -> Optimizer:
    """Wrap an arbitrary optax transformation."""
    return Optimizer(tx, kind=kind, **meta)


# ---- LR schedules (counterpart of torch.optim.lr_scheduler via
#      betty/patch/scheduler.py) ----

def step_lr(lr: float, step_size: int, gamma: float = 0.1) -> Callable:
    def schedule(step):
        return lr * gamma ** (step // step_size)

    return schedule


def cosine_lr(lr: float, total_steps: int, min_lr: float = 0.0) -> Callable:
    def schedule(step):
        frac = jnp.minimum(step / max(total_steps, 1), 1.0)
        return min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(jnp.pi * frac))

    return schedule


def lambda_lr(lr: float, lr_lambda: Callable) -> Callable:
    def schedule(step):
        return lr * lr_lambda(step)

    return schedule


def multistep_lr(lr: float, milestones, gamma: float = 0.1) -> Callable:
    """torch ``MultiStepLR`` counterpart: multiply by ``gamma`` at each
    milestone step (reference MWN uses milestones=[10000, 13000],
    ``examples/learning_to_reweight/main.py:146-150``)."""
    ms = tuple(int(m) for m in milestones)

    def schedule(step):
        n = sum(jnp.asarray(step >= m, jnp.int32) for m in ms)
        return lr * gamma ** n

    return schedule
