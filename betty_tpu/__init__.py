"""betty_tpu — a TPU-native framework for generalized meta-learning and
multilevel optimization.

A from-scratch JAX/XLA re-architecture with the full capability surface of
leopard-ai/betty (Problem/Engine multilevel programs, darts/sama/neumann/cg
hypergradient solvers, ITD via differentiable unrolls, DP/ZeRO/FSDP scaling)
designed TPU-first: pure pytree problem states, jit-compiled meta steps,
lax.scan unrolls, and sharding-based distribution over a jax device mesh.
"""

__version__ = "0.1.0"

# Multi-process cluster join must precede ANY backend initialization (the
# first jnp array a user builds), so it happens at import when the
# environment requests it (BETTY_COORDINATOR_ADDRESS / JAX_COORDINATOR_
# ADDRESS); a no-op otherwise. Engine.configure_systems calls it again
# idempotently. Counterpart of torchrun's process-group bootstrap
# (reference betty/engine.py:166-179).
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # Some TPU runtime plugins override the JAX_PLATFORMS env var during
    # discovery; an explicit CPU request must win (documented behavior for
    # all examples/tutorials: "CPU-testable, TPU-identical"). The config
    # API takes precedence over plugin discovery.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from betty_tpu.parallel.mesh import maybe_init_distributed as _init_dist

_init_dist()

from betty_tpu.configs import Config, EngineConfig
from betty_tpu.engine import Engine
from betty_tpu.problems import (
    ImplicitProblem,
    IterativeProblem,
    PenaltyProblem,
    Problem,
)
from betty_tpu import module, optim, utils

__all__ = [
    "Config",
    "EngineConfig",
    "Engine",
    "Problem",
    "ImplicitProblem",
    "IterativeProblem",
    "PenaltyProblem",
    "module",
    "optim",
    "utils",
]
