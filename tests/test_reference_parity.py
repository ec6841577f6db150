"""Engine-trajectory parity against the ACTUAL reference library.

Runs reference_parity_impl.py in a subprocess (float64 on both sides) so
``jax_enable_x64`` doesn't pollute the float32 test session. The reference
at /root/reference is imported and executed — not re-implemented — so this
is the load-bearing BASELINE.md "hypergradients within 1e-5 of PyTorch
Betty" check at the whole-engine level (per-step parameter trajectories,
both problems, darts/cg/neumann/sama x unroll x gas x roll_back x warmup
x LR schedule), plus a BatchNorm model, the trilevel learning_by_ignoring
graph (two hypergradient paths), and PenaltyProblem."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # executes the torch reference in-process; ~2.5 min


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/betty"),
    reason="reference library not present",
)
def test_engine_trajectory_parity_vs_reference():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # plain single-device CPU is fine here
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "reference_parity_impl.py"),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    print(result.stdout)
    print(result.stderr, file=sys.stderr)
    assert result.returncode == 0, "engine trajectories diverge from reference betty"


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/betty"),
    reason="reference library not present",
)
def test_random_graph_parity_vs_reference():
    """Fuzzed multilevel DAGs (paths/leaves/counts/trajectories) against
    the actual reference engine — see graph_fuzz_impl.py."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "graph_fuzz_impl.py"),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    print(result.stdout)
    print(result.stderr, file=sys.stderr)
    assert result.returncode == 0, "random-graph mechanics diverge from reference betty"
