from betty_tpu.problems.problem import Problem
from betty_tpu.problems.implicit import ImplicitProblem, PenaltyProblem
from betty_tpu.problems.iterative import IterativeProblem

__all__ = ["Problem", "ImplicitProblem", "PenaltyProblem", "IterativeProblem"]
