"""Hypergradient parity vs torch autograd (BASELINE.md: within 1e-5).

Runs golden_impl.py in a subprocess so float64 can be enabled without
polluting the float32 test session."""

import os
import subprocess
import sys


def test_solver_golden_vs_torch():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # plain single-device CPU is fine here
    result = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "golden_impl.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    print(result.stdout)
    print(result.stderr, file=sys.stderr)
    assert result.returncode == 0, "solver outputs diverge from torch reference"
