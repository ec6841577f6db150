"""ImplicitProblem — the recommended default problem type (AID).

Counterpart of reference ``betty/problems/implicit_problem.py``. Almost all
of that class's body (GradScaler handling, SAMA ``last_grad`` caching,
deepcopy state cache) is subsumed by the functional base class:

* no GradScaler on TPU (bf16 needs no loss scaling);
* ``last_grad`` is a state-pytree field updated inside the jitted optimizer
  step (``Problem._apply_optimizer``), matching
  ``implicit_problem.py:51-55,61-65``;
* roll-back caching is keeping a reference to the immutable pre-unroll state
  pytree — no deepcopy (``implicit_problem.py:67-78``).
"""

from betty_tpu.problems.problem import Problem


class ImplicitProblem(Problem):
    """Approximate implicit differentiation (AID) problem."""


class PenaltyProblem(ImplicitProblem):
    """Penalty-based MLO problem.

    The reference's ``PenaltyProblem`` (``betty/problems/penalty_problem.py``)
    is ``ImplicitProblem`` minus the SAMA ``last_grad`` caching; we disable
    that state field accordingly.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._needs_last_grad = False
