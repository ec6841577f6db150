"""Real-data acceptance harness: run the reference's exact configurations
and assert its published README accuracy bands.

This environment has no dataset egress, so the harness cannot be *executed*
to completion here — it exists so that the day a real dataset copy is
mountable, the parity claim becomes one command:

    python scripts/reproduce_baseline.py mwn   --data-dir /data/cifar10 --imbalanced_factor 100
    python scripts/reproduce_baseline.py darts --data-dir /data/cifar10
    python scripts/reproduce_baseline.py imaml --data-dir /data/omniglot.npz

Bands asserted (reference READMEs, see BASELINE.md):

* MWN long-tailed CIFAR-10: best test acc >= {IF200: 75.56, IF100: 77.73,
  IF50: 80.26} - margin  (`/root/reference/examples/learning_to_reweight/README.md:37-40`)
* DARTS NAS CIFAR-10 (search then eval): final test acc >= 97.35 - margin
  (`/root/reference/examples/neural_architecture_search/README.md:48-52`)
* iMAML Omniglot 5-way 1-shot: meta-test acc >= 98.68 - margin
  (`/root/reference/examples/implicit_maml/README.md:44-50`)

``--margin`` (default 1.0 accuracy points) absorbs RNG/backend variation
between torch-on-GPU and JAX-on-TPU; set 0 for the strict bar.

``--smoke`` runs each pipeline for a handful of iterations on the synthetic
fixtures (no dataset needed) and asserts only that the full plumbing —
exact-config engine build, train, validation metric — executes. The test
suite runs the smoke tier (tests/test_reproduce_baseline.py).
"""

import argparse
import importlib.util
import json
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "examples"))

MWN_BANDS = {200: 75.56, 100: 77.73, 50: 80.26}
DARTS_BAND = 97.35
IMAML_BANDS = {(5, 1): 98.68, (5, 5): 99.58, (20, 1): 92.90, (20, 5): 98.04}


def _load(example, module="main"):
    """Load an example's entry module under a unique name (several examples
    have a ``main.py``, and some import siblings by path — loading them all
    as ``main`` would shadow each other)."""
    path = ROOT / "examples" / example / f"{module}.py"
    name = f"repro_{example}_{module}"
    if name in sys.modules:
        return sys.modules[name]
    sys.path.insert(0, str(ROOT / "examples" / example))
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


def _report(name, value, band, margin):
    ok = value >= band - margin
    verdict = "PASS" if ok else "FAIL"
    print(json.dumps({
        "workload": name, "measured_acc": round(float(value), 2),
        "reference_band": band, "margin": margin, "verdict": verdict,
    }))
    return ok


def run_mwn(args):
    """Reference config: examples/learning_to_reweight/main.py argparse
    defaults + README table settings — batch 100, 15000 iters, valid every
    500, SGD(0.1, momentum 0.9, wd 5e-4) with MultiStepLR [10000, 13000],
    Adam meta-opt lr 1e-5, darts solver, unroll 1, num_meta 1000,
    train-time crop+flip augmentation."""
    mwn = _load("learning_to_reweight")
    if args.smoke:
        argv = ["--train_iters", "4", "--batch_size", "16",
                "--train_size", "128", "--meta_size", "32",
                "--valid_step", "1000000",
                "--lr_milestones", "2,3", "--augment"]
        engine = mwn.build_engine(mwn.parse_args(argv))
        engine.run()
        print(json.dumps({"workload": "mwn", "smoke": "ok"}))
        return True
    if_ = int(args.imbalanced_factor)
    band = MWN_BANDS[if_]
    argv = [
        "--data-dir", args.data_dir,
        "--imbalanced_factor", str(if_),
        "--batch_size", "100",
        "--train_iters", "15000",
        "--valid_step", "500",
        "--lr", "0.1", "--momentum", "0.9", "--weight_decay", "5e-4",
        "--meta_lr", "1e-5",
        "--num_meta", "1000",
        "--lr_milestones", "10000,13000",
        "--augment",
        "--solver", "darts",
    ]
    engine = mwn.build_engine(mwn.parse_args(argv))
    engine.run()
    return _report(f"mwn_if{if_}", engine.best_acc, band, args.margin)


def run_darts(args):
    """Reference config: search (8 cells, 16 channels, darts solver,
    50 epochs) then evaluation of the discovered genotype (20 cells, 36
    channels, 600 epochs, cutout + auxiliary head) —
    reference examples/neural_architecture_search/README.md:28-46."""
    search = _load("neural_architecture_search")
    train = _load("neural_architecture_search", "train")
    from betty_tpu.models.darts import derive_genotype, genotype_to_json

    genotype = Path(args.genotype_out or
                    tempfile.mkstemp(suffix=".json")[1])

    def write_genotype(engine):
        genotype.write_text(
            genotype_to_json(derive_genotype(engine.arch.params)))

    if args.smoke:
        argv = ["--train_iters", "2", "--batch_size", "8",
                "--train_size", "64", "--layers", "2", "--channels", "4",
                "--valid_step", "1000000"]
        engine = search.build_engine(search.parse_args(argv))
        engine.run()
        write_genotype(engine)
        eng2 = train.build_engine(train.parse_args(
            ["--genotype-file", str(genotype), "--epochs", "1",
             "--batch_size", "8", "--train_size", "32", "--layers", "2",
             "--init_channels", "4"]))
        eng2.run()
        print(json.dumps({"workload": "darts", "smoke": "ok"}))
        return True
    # search phase: CIFAR-10, half train/half valid handled by the example
    n_search_iters = 50 * (25000 // 64)  # 50 epochs at batch 64
    argv = [
        "--data-dir", args.data_dir,
        "--batch_size", "64", "--channels", "16", "--layers", "8",
        "--lr", "0.025", "--arch_lr", "3e-4",
        "--train_iters", str(n_search_iters),
        "--valid_step", str(25000 // 64),
    ]
    engine = search.build_engine(search.parse_args(argv))
    engine.run()
    write_genotype(engine)
    # evaluation phase: retrain the discovered genotype from scratch
    eng2 = train.build_engine(train.parse_args([
        "--data-dir", args.data_dir,
        "--genotype-file", str(genotype),
        "--batch_size", "96", "--epochs", "600",
        "--init_channels", "36", "--layers", "20",
        "--learning_rate", "0.025", "--auxiliary",
        "--cutout", "--drop_path_prob", "0.2",
    ]))
    eng2.run()
    return _report("darts_nas", eng2.best_acc, DARTS_BAND, args.margin)


def run_imaml(args):
    """Reference config: 5-way 1-shot Omniglot, CG(5, alpha 1.0) proximal
    adaptation, inner 5 steps, meta-batch 16 via gradient accumulation —
    reference examples/implicit_maml/main.py:198-210."""
    imaml = _load("implicit_maml")
    if args.smoke:
        argv = ["--train_iters", "2", "--ways", "3", "--shots", "1",
                "--inner_steps", "2", "--meta_batch_size", "2",
                "--valid_step", "1000000", "--eval_tasks", "2"]
        engine = imaml.build_engine(imaml.parse_args(argv))
        engine.run()
        print(json.dumps({"workload": "imaml", "smoke": "ok"}))
        return True
    ways, shots = int(args.ways), int(args.shots)
    band = IMAML_BANDS[(ways, shots)]
    argv = [
        "--data-dir", args.data_dir,
        "--ways", str(ways), "--shots", str(shots),
        "--inner_steps", "5", "--meta_batch_size", "16",
        "--inner_lr", "0.1", "--meta_lr", "1e-3", "--reg", "2.0",
        "--train_iters", "30000", "--valid_step", "1000",
        "--eval_tasks", "1000",
    ]
    engine = imaml.build_engine(imaml.parse_args(argv))
    engine.run()
    acc = engine.validation()["meta_test_acc"]
    return _report(f"imaml_{ways}w{shots}s", acc, band, args.margin)


RUNNERS = {"mwn": run_mwn, "darts": run_darts, "imaml": run_imaml}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("workload", choices=sorted(RUNNERS))
    p.add_argument("--data-dir", dest="data_dir", default=None,
                   help="real dataset location (required unless --smoke)")
    p.add_argument("--margin", type=float, default=1.0,
                   help="accuracy points below the reference band tolerated")
    p.add_argument("--smoke", action="store_true",
                   help="synthetic-fixture pipeline check, no band assert")
    p.add_argument("--imbalanced_factor", type=int, default=100,
                   choices=sorted(MWN_BANDS), help="(mwn)")
    p.add_argument("--ways", type=int, default=5, help="(imaml)")
    p.add_argument("--shots", type=int, default=1, help="(imaml)")
    p.add_argument("--genotype-out", default=None, help="(darts)")
    args = p.parse_args(argv)
    if not args.smoke and not args.data_dir:
        p.error("--data-dir is required unless --smoke")
    t0 = time.time()
    ok = RUNNERS[args.workload](args)
    print(f"# {args.workload}: {'PASS' if ok else 'FAIL'} "
          f"({time.time() - t0:.0f}s)", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
