"""Fixed CG-throughput probe for bisecting the r2->r4 regression.

Usage: python scripts/cg_bisect_probe.py [solver]
Run from the tree under test (HEAD or a worktree of an older commit).
Mirrors bench.py's bench_solver() exactly: MWN example, compiled blocks,
K=32 periods/dispatch, dependent-readback sync.
"""
import statistics
import sys
import time
from pathlib import Path

root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root))
sys.path.insert(0, str(root / "examples" / "learning_to_reweight"))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from main import build_engine, parse_args  # noqa: E402
from betty_tpu.compile import BlockRunner  # noqa: E402

SOLVER = sys.argv[1] if len(sys.argv) > 1 else "cg"
BATCH = 128
META_STEPS_TIMED = 96

argv = [
    "--train_iters", "0",
    "--batch_size", str(BATCH),
    "--train_size", str(BATCH * 16),
    "--meta_size", str(BATCH * 8),
    "--device_data",
    "--solver", SOLVER,
    "--precision", "fp32",
]
if SOLVER == "cg":
    argv += ["--cg_iterations", "3", "--cg_alpha", "1.0"]
if SOLVER == "neumann":
    argv += ["--neumann_iterations", "5", "--neumann_alpha", "0.01"]

engine = build_engine(parse_args(argv))
engine.train()
K = 32
runner = BlockRunner(engine, scan_periods=K)


def _sync():
    return float(
        np.asarray(
            jax.tree_util.tree_leaves(engine.states["classifier"]["params"])[0]
        ).ravel()[0]
    )


t0 = time.perf_counter()
for _ in range(2):
    runner.run_block()
_sync()
print(f"# warmup+compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

rates = []
for _ in range(5):
    n_blocks = max(1, META_STEPS_TIMED // K)
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        runner.run_block()
    _sync()
    t1 = time.perf_counter()
    rates.append(n_blocks * K / (t1 - t0))

print({"solver": SOLVER, "median": round(statistics.median(rates), 2),
       "peak": round(max(rates), 2), "rates": [round(r, 1) for r in rates]})
