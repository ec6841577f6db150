"""IterativeProblem — iterative differentiation (ITD / MAML-style).

Counterpart of reference ``betty/problems/iterative_problem.py`` (functorch
``make_functional_with_buffers`` + Betty's out-of-place differentiable
optimizers) and ``iterative_problem_higher.py`` (the ``higher`` backend).
Both reference backends exist to keep inner parameter updates on the
autodiff tape; in JAX **every optax update is already differentiable**, so
ITD reduces to a differentiable ``lax.scan`` over (loss, grad, update).

Mechanics: during the eager unroll this problem records the batches it
consumed and the pre-unroll state; when a parent problem computes its
gradient, the child's post-unroll parameters are *replayed* as a pure
function of the trace context (``replay_unroll``) so the parent's
``jax.grad`` flows through every inner update — the exact gradient the
reference obtains from the retained torch graph. The replay recomputes the
unroll forward (classic rematerialization: trading FLOPs for the memory the
reference spends retaining the full tape — the right trade on TPU).

MAML-style meta-initialization: override ``unroll_init(self)`` to return the
initial inner parameters *as a function of other problems' traced params*
(e.g. ``return self.outer.params``) — gradients then flow to the meta-init,
which is what ``higher.patch.monkeypatch`` achieves in the reference
(``iterative_problem_higher.py:146-170``).

Note: differentiating through Adam at zero second moment yields NaNs
(d/dx sqrt(x) at 0); use SGD inner optimizers or an Adam with nonzero
``eps_root`` for ITD, as is standard for MAML.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from betty_tpu.problems.problem import Problem, _CtxBinding, ctx_replace


class IterativeProblem(Problem):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._unroll_batches: List[Any] = []
        self._unroll_start_state: Optional[Dict[str, Any]] = None

    # -- unroll bookkeeping ------------------------------------------------
    def step_normal(self, global_step=None):
        if self.check_ready() and self._inner_loop_start:
            # record the differentiation starting point *after* the user's
            # on_inner_loop_start hook runs (the hook may reset params)
            self._pending_unroll_reset = True
        super().step_normal(global_step=global_step)

    def step_after_roll_back(self):
        # the roll-back re-step (base problem.py step_after_roll_back) is an
        # extra descent OUTSIDE the counted unroll: the next window's replay
        # starts from the post-re-step state (recorded by the next
        # inner-loop-start reset), so its batch must not be appended to the
        # already-consumed window's recording
        self._in_rollback_restep = True
        try:
            super().step_after_roll_back()
        finally:
            self._in_rollback_restep = False

    def one_step_descent(self, batch=None, advance_sched=None):
        if getattr(self, "_pending_unroll_reset", False):
            self._unroll_start_state = self.state
            self._unroll_batches = []
            self._pending_unroll_reset = False
        loss_dict = super().one_step_descent(
            batch=batch, advance_sched=advance_sched
        )
        if not getattr(self, "_in_rollback_restep", False):
            self._unroll_batches.append(self.cur_batch)
            # the stacked-batches cache serves multiple parents within ONE
            # window; any recording change invalidates it
            self._unroll_stack_cache = None
        return loss_dict

    # -- differentiable replay ----------------------------------------------
    def get_unroll_data(self):
        """Host-side: package the recorded unroll (start state + stacked
        batches) to be passed as *arguments* into a parent's jitted update
        (they must not be baked into the trace as constants)."""
        assert self._unroll_start_state is not None and self._unroll_batches, (
            f"IterativeProblem {self.name} has no recorded unroll to replay"
        )
        n = len(self._unroll_batches)
        stacked = getattr(self, "_unroll_stack_cache", None)
        if stacked is None:
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *self._unroll_batches
            )
            self._unroll_stack_cache = stacked
        start = self._unroll_start_state
        return {
            "start_params": start["params"],
            "start_opt_state": start["opt_state"],
            "start_sched_step": start["sched_step"],
            "start_extra": start["extra"],
            # the count just before the window's first micro-step: the eager
            # path folds rng per step from the POST-increment count, so micro
            # m uses fold_in(key, start_count + m + 1)
            "start_count": jnp.asarray(self._count - n, jnp.int32),
            "batches": stacked,
        }

    def unroll_init(self, start_params):
        """Initial inner parameters for the differentiable replay. Default:
        the cached pre-unroll parameters (constants w.r.t. the meta params).
        Override to couple to meta-parameters, e.g.
        ``return self.outer.params`` (ignore the argument)."""
        return start_params

    def replay_unroll(self, ctx, data, rng=None):
        """Re-run this problem's last unroll as a pure differentiable function
        of the trace context; returns post-unroll params. ``data`` comes from
        :meth:`get_unroll_data` and is threaded through the parent's jitted
        update as an argument.

        Trajectory fidelity: the replay mirrors the eager unroll exactly —
        per-micro-step rng folding (dropout masks match), mutable-collection
        (BatchNorm) threading, gradient clipping / grad_callback /
        param_callback / custom_optimizer_step via the same
        ``_apply_optimizer``, and the roll-back scheduler freeze — so the
        parent differentiates the trajectory that actually ran
        (tests/test_itd.py asserts endpoint equality)."""
        from betty_tpu.utils import tree_add, tree_zeros_like

        with _CtxBinding(ctx, None, rng):
            init_params = self.unroll_init(data["start_params"])

        stacked = data["batches"]
        problem = self
        gas = self.gas
        if gas > 1:
            # gradient accumulation: group the recorded micro-batches into
            # optimizer steps of `gas` each (driver semantics, reference
            # problem.py:354-357 + 391-392)
            stacked = jax.tree_util.tree_map(
                lambda x: x.reshape((x.shape[0] // gas, gas) + x.shape[1:]),
                stacked,
            )

        # eager parity: sched_step is frozen during roll_back unrolls
        # (problem.py build_update_fn advance_sched = not _roll_back)
        advance = not self._roll_back
        base_key = jax.random.PRNGKey(self._rng_seed)
        start_count = data.get("start_count")
        start_extra = data.get("start_extra", ctx[self.name]["extra"])
        n_groups = jax.tree_util.tree_leaves(stacked)[0].shape[0]

        def inner_step(carry, xs):
            state = carry
            k, batch_group = xs

            grad_acc = tree_zeros_like(state["params"])
            extra = state["extra"]
            for j in range(gas):
                micro = (
                    batch_group if gas == 1
                    else jax.tree_util.tree_map(lambda x: x[j], batch_group)
                )
                r = rng
                if start_count is not None:
                    # the eager path increments count BEFORE descending
                    r = jax.random.fold_in(
                        base_key, start_count + k * gas + j + 1
                    )

                def loss_fn(p, _extra=extra, _micro=micro, _r=r):
                    c = dict(ctx)
                    c[problem.name] = {"params": p, "extra": _extra}
                    loss, _, mutated = problem.eval_loss(
                        c, _micro, rng=_r, capture=True
                    )
                    return loss / gas, mutated

                (_, mutated), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state["params"])
                grad_acc = tree_add(grad_acc, g)
                if mutated:
                    extra = {**extra, **mutated}
                if problem.is_implemented("grad_callback"):
                    # eager parity: the hook fires after EVERY micro-step on
                    # the running accumulation (build_update_fn); its edits
                    # flow through the differentiable replay
                    from betty_tpu.problems.problem import _CtxBinding

                    problem._trace_grads = grad_acc
                    cc = dict(ctx)
                    cc[problem.name] = {"params": state["params"],
                                        "extra": extra}
                    with _CtxBinding(cc, None, r):
                        problem.grad_callback()
                    grad_acc = problem._trace_grads
                    problem._trace_grads = None

            step_state = dict(state)
            step_state["extra"] = extra
            step_state["grad_acc"] = grad_acc
            if advance and gas > 1:
                # eager advances sched per MICRO-step (after each update), so
                # the boundary optimizer call sees start + gas - 1
                step_state["sched_step"] = step_state["sched_step"] + (gas - 1)
            c = dict(ctx)
            c[problem.name] = {"params": state["params"], "extra": extra}
            # same boundary logic as the eager path: clipping, callbacks,
            # custom steps, last_grad — _apply_optimizer is the single
            # source (cross-problem hook edits cannot be threaded through a
            # differentiable REPLAY of another problem's trajectory; they
            # apply on the eager path)
            step_state, _ = problem._apply_optimizer(step_state, c, rng)
            if advance:
                step_state["sched_step"] = step_state["sched_step"] + 1
            return step_state, None

        start_state = {
            "params": init_params,
            "extra": start_extra,
            "opt_state": data["start_opt_state"],
            "sched_step": data["start_sched_step"],
            "grad_acc": tree_zeros_like(init_params),
        }
        if self._needs_last_grad:
            start_state["last_grad"] = tree_zeros_like(init_params)
        final_state, _ = jax.lax.scan(
            inner_step,
            start_state,
            (jnp.arange(n_groups, dtype=jnp.int32), stacked),
        )
        return final_state["params"]
