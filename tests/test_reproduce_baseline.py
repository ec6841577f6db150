"""Smoke tier of the real-data acceptance harness
(scripts/reproduce_baseline.py): each workload's exact-config pipeline
builds, trains a few iterations on the synthetic fixtures, and (for mwn)
the --baseline/--retrain/--export_weights modes round-trip.

The full harness asserts the reference README accuracy bands and needs a
real dataset copy (no egress here) — these tests prove the command works so
the parity claim is one command away when a dataset is mountable.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
SCRIPT = ROOT / "scripts" / "reproduce_baseline.py"

pytestmark = pytest.mark.slow  # budget: ~2-4 min/workload (CPU compiles)


def _run(args):
    return subprocess.run(
        [sys.executable, str(SCRIPT), *args],
        capture_output=True, text=True, timeout=900, cwd=str(ROOT),
    )


@pytest.mark.parametrize("workload", ["mwn", "imaml", "darts"])
def test_smoke(workload):
    r = _run([workload, "--smoke"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert '"smoke": "ok"' in r.stdout


def test_mwn_baseline_retrain_roundtrip(tmp_path):
    """--export_weights from a bilevel run feeds --retrain; --baseline
    trains single-level (reference main.py:23-24 one-flag modes)."""
    sys.path.insert(0, str(ROOT / "examples" / "learning_to_reweight"))
    try:
        import main as mwn
    finally:
        sys.path.pop(0)
    common = ["--train_iters", "3", "--batch_size", "16",
              "--train_size", "128", "--meta_size", "32",
              "--valid_step", "1000000"]
    engine = mwn.build_engine(mwn.parse_args(common))
    engine.run()
    npz = tmp_path / "reweight.npz"
    mwn.export_sample_weights(engine, str(npz), batch=32)
    saved = np.load(npz)
    assert set(saved.files) == {"weights", "indexes", "labels"}
    assert len(saved["weights"]) == 128
    assert (saved["weights"] >= 0).all()

    e_base = mwn.build_engine(mwn.parse_args(common + ["--baseline"]))
    assert len(e_base.problems) == 1
    e_base.run()

    e_re = mwn.build_engine(mwn.parse_args(
        common + ["--retrain", "--reweight_path", str(npz)]))
    assert len(e_re.problems) == 1
    e_re.run()
