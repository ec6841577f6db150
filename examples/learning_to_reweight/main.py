"""Learning-to-reweight (Meta-Weight-Net) on CIFAR-10.

Capability port of reference ``examples/learning_to_reweight/main.py``
(bilevel: MLP reweighter <- ResNet-32 on imbalanced/noisy CIFAR-10, darts
solver, unroll=1), re-built for TPU: one jitted meta-step, bf16-ready, DP
over a device mesh with a flag.

Data: synthetic CIFAR-shaped by default (this environment has no dataset
egress). Pass ``--data-dir`` with a local CIFAR-10 copy (torchvision pickle
layout or an npz with x_train/y_train/x_test/y_test) for the real workload,
plus ``--imbalanced_factor`` / ``--corruption_type`` / ``--corruption_ratio``
for the long-tail / noisy-label settings of the reference README's accuracy
table. ``validation()`` reports test accuracy and checkpoints on improvement
(reference ``main.py:160-178``).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.data import ArrayLoader
from betty_tpu.models import MetaWeightNet, ResNet32
from betty_tpu.module import from_flax

from mwn_data import augment_batch, build_splits, load_cifar10


def make_synthetic_cifar(n, num_classes=10, seed=0, image=(32, 32, 3)):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, *image).astype(np.float32)
    y = rng.randint(0, num_classes, size=n).astype(np.int32)
    return x, y


class BatchLoader(ArrayLoader):
    """Epoch-seeded minibatch loader; optional host-side train augmentation
    (reflect-pad crop + flip, reference data.py:56-62). Augmentation implies
    host batches (incompatible with device=True)."""

    def __init__(self, x, y, batch_size, seed=0, drop_last=True,
                 device=False, augment=False):
        assert not (augment and device), "augmentation is host-side"
        super().__init__(x, y, batch_size=batch_size, seed=seed,
                         drop_last=drop_last, device=device)
        self.augment = augment
        # no augmentation => postprocess is a pass-through; keep the
        # device-resident in-block gather fast path eligible
        self.postprocess_is_identity = not augment
        self._aug_rng = np.random.RandomState(seed + 77)

    def postprocess(self, batch):
        # hook (not __iter__) so augmentation survives mid-epoch checkpoint
        # resume (iter_from) and per-host sharding (shard_loader)
        if self.augment:
            x, y = batch
            return augment_batch(np.asarray(x), self._aug_rng), y
        return batch


class WeightedSampleLoader(BatchLoader):
    """Epoch-seeded sampling-with-replacement weighted by per-example
    sample weights — the counterpart of the reference ``--retrain`` mode's
    ``WeightedRandomSampler(sample_weight, len(sample_weight))``
    (reference ``main.py:53-60``)."""

    def __init__(self, x, y, weights, batch_size, **kw):
        super().__init__(x, y, batch_size=batch_size, **kw)
        w = np.asarray(weights, np.float64).clip(min=0)
        assert len(w) == len(x)
        total = w.sum()
        self.probs = (w / total) if total > 0 else np.full(len(w), 1 / len(w))

    def _epoch_order(self, epoch):
        r = np.random.RandomState(self.seed + epoch)
        return r.choice(self.n, size=self.n, replace=True, p=self.probs)


class Reweight(ImplicitProblem):
    def training_step(self, batch):
        inputs, labels = batch
        outputs = self.classifier(inputs)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            outputs, labels
        ).mean()
        acc = (outputs.argmax(axis=1) == labels).mean() * 100
        return {"loss": loss, "acc": acc}


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        inputs, labels = batch
        outputs = self.module(inputs)
        ce = optax.softmax_cross_entropy_with_integer_labels(outputs, labels)
        weight = self.reweight(jax.lax.stop_gradient(ce))
        return jnp.mean(weight * ce)


class BaselineClassifier(ImplicitProblem):
    """Uniform-loss single-level training — the reference's ``--baseline``
    and ``--retrain`` loss (plain mean CE, reference ``main.py:120-121``)."""

    def training_step(self, batch):
        inputs, labels = batch
        outputs = self.module(inputs)
        return optax.softmax_cross_entropy_with_integer_labels(
            outputs, labels
        ).mean()


class MWNEngine(Engine):
    """Engine with test-accuracy validation + best-checkpoint saving
    (reference examples/learning_to_reweight/main.py:160-178)."""

    test_data = None  # (x, y) set by build_engine when a test set exists
    checkpoint_dir = None
    eval_batch = 512
    best_acc = -1.0

    def validation(self):
        if self.test_data is None:
            return {}
        from vision_data import problem_accuracy

        x, y = self.test_data
        acc = problem_accuracy(self.classifier, x, y, batch=self.eval_batch)
        if acc > self.best_acc:
            self.best_acc = acc
            if self.checkpoint_dir:
                self.save_checkpoint(self.checkpoint_dir)
        return {"acc": acc, "best_acc": self.best_acc}


def make_schedule(args):
    """Classifier LR schedule. ``--lr_milestones`` reproduces the
    reference's ``MultiStepLR(milestones=[10000, 13000], gamma=0.1)``
    (reference ``main.py:146-150``); ``--lr_schedule`` keeps the simpler
    step decay."""
    if args.lr_milestones:
        ms = [int(m) for m in args.lr_milestones.split(",")]
        return optim.multistep_lr(args.lr, ms, gamma=0.1)
    if args.lr_schedule:
        return optim.step_lr(args.lr, step_size=10000, gamma=0.1)
    return None


def build_engine(args):
    test_data = None
    idx_train = None
    if args.data_dir:
        x_all, y_all, x_test, y_test = load_cifar10(args.data_dir)
        x_train, y_train, x_meta, y_meta, idx_train = build_splits(
            x_all, y_all,
            num_classes=args.num_classes,
            num_meta_total=args.num_meta,
            imbalanced_factor=args.imbalanced_factor,
            corruption_type=args.corruption_type,
            corruption_ratio=args.corruption_ratio,
            seed=args.data_seed,
            return_indices=True,
        )
        base_x = x_all
        test_data = (x_test, y_test)
    else:
        x_train, y_train = make_synthetic_cifar(args.train_size, seed=0)
        x_meta, y_meta = make_synthetic_cifar(args.meta_size, seed=1)
        base_x = x_train
        idx_train = np.arange(len(x_train))

    if args.retrain:
        # reference --retrain (main.py:53-60): reload the persisted kept-set
        # indices + (possibly corrupted) labels and sample it weighted by
        # the trained reweighter's per-example weights, plain-CE loss
        saved = np.load(args.reweight_path)
        x_train = base_x[saved["indexes"]]
        y_train = saved["labels"].astype(np.int32)
        train_loader = WeightedSampleLoader(
            x_train, y_train, saved["weights"], args.batch_size, seed=0,
            device=args.device_data, augment=args.augment)
    else:
        train_loader = BatchLoader(x_train, y_train, args.batch_size, seed=0,
                                   device=args.device_data,
                                   augment=args.augment)
    meta_loader = BatchLoader(x_meta, y_meta, args.batch_size, seed=1,
                              device=args.device_data)

    sample = jnp.zeros((args.batch_size, 32, 32, 3), jnp.float32)
    classifier_mod = from_flax(
        ResNet32(args.num_classes), sample, rng=jax.random.PRNGKey(0),
        train_kwarg="train",
    )

    single_level = args.baseline or args.retrain
    if single_level:
        # reference main.py:198-201: baseline/retrain run the inner problem
        # alone — one problem, no dependency edges, uniform CE
        classifier = BaselineClassifier(
            name="classifier",
            module=classifier_mod,
            optimizer=optim.sgd(
                lr=args.lr, momentum=args.momentum,
                weight_decay=args.weight_decay, nesterov=True,
                schedule=make_schedule(args),
            ),
            train_data_loader=train_loader,
            config=Config(precision=args.precision, log_step=args.log_step),
        )
        engine = MWNEngine(
            config=EngineConfig(
                train_iters=args.train_iters,
                valid_step=args.valid_step,
                strategy=args.strategy,
                compile_blocks=args.compile_blocks,
            ),
            problems=[classifier],
            dependencies={"u2l": {}, "l2u": {}},
        )
        engine.test_data = test_data
        engine.checkpoint_dir = args.checkpoint_dir
        return engine

    mwn_mod = from_flax(
        MetaWeightNet(), jnp.zeros((args.batch_size,)),
        rng=jax.random.PRNGKey(1), train_kwarg="train",
    )

    reweight = Reweight(
        name="reweight",
        module=mwn_mod,
        optimizer=optim.adam(lr=args.meta_lr, weight_decay=args.meta_weight_decay),
        train_data_loader=meta_loader,
        config=Config(type=args.solver, precision=args.precision,
                      log_step=args.log_step),
    )
    classifier = Classifier(
        name="classifier",
        module=classifier_mod,
        optimizer=optim.sgd(
            lr=args.lr, momentum=args.momentum, weight_decay=args.weight_decay,
            nesterov=True,
            schedule=make_schedule(args),
        ),
        train_data_loader=train_loader,
        config=Config(type=args.solver, unroll_steps=args.unroll_steps,
                      precision=args.precision, log_step=args.log_step,
                      **solver_kwargs(args)),
    )

    engine = MWNEngine(
        config=EngineConfig(
            train_iters=args.train_iters,
            valid_step=args.valid_step,
            strategy=args.strategy,
            compile_blocks=args.compile_blocks,
        ),
        problems=[reweight, classifier],
        dependencies={
            "u2l": {reweight: [classifier]},
            "l2u": {classifier: [reweight]},
        },
    )
    engine.test_data = test_data
    engine.checkpoint_dir = args.checkpoint_dir
    # stash the exact train set + base-array indices for --export_weights
    engine.train_set = (x_train, y_train, idx_train)
    return engine


def export_sample_weights(engine, path, batch=512):
    """Persist the trained reweighter's per-example weights over the kept
    training set, plus the set's base-array indices and (possibly
    corrupted) labels — the single-npz counterpart of the reference's
    ``reweight.pt`` / ``train_index.pt`` / ``train_label.pt`` trio that its
    ``--retrain`` mode consumes (reference ``main.py:56-59``). The weight of
    example i is ``meta_net(CE_i)`` at the final classifier parameters."""
    x, y, idx = engine.train_set
    weights = []
    clf, rw = engine.classifier, engine.reweight
    # eval mode: BatchNorm must use running statistics, or each example's
    # exported weight would depend on its co-batch (and on `batch`) and
    # disagree with the eval-mode forward used by validation
    engine.eval()
    for i in range(0, len(x) - batch + 1, batch):
        xb = jnp.asarray(x[i:i + batch])
        yb = jnp.asarray(y[i:i + batch])
        ce = optax.softmax_cross_entropy_with_integer_labels(clf(xb), yb)
        weights.append(np.asarray(rw(ce)).reshape(-1))
    tail = len(x) % batch
    if tail:
        xb = jnp.asarray(x[-tail:])
        yb = jnp.asarray(y[-tail:])
        ce = optax.softmax_cross_entropy_with_integer_labels(clf(xb), yb)
        weights.append(np.asarray(rw(ce)).reshape(-1))
    engine.train()
    np.savez(path, weights=np.concatenate(weights),
             indexes=np.asarray(idx), labels=np.asarray(y))


def solver_kwargs(args):
    if args.solver == "cg":
        return {"cg_iterations": args.cg_iterations, "cg_alpha": args.cg_alpha}
    if args.solver == "neumann":
        return {"neumann_iterations": args.neumann_iterations,
                "neumann_alpha": args.neumann_alpha}
    return {}


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--meta_lr", type=float, default=1e-5)
    p.add_argument("--meta_weight_decay", type=float, default=0.0)
    p.add_argument("--solver", type=str, default="darts",
                   choices=["darts", "sama", "cg", "neumann"])
    p.add_argument("--cg_iterations", type=int, default=3)
    p.add_argument("--cg_alpha", type=float, default=1.0)
    p.add_argument("--neumann_iterations", type=int, default=5)
    p.add_argument("--neumann_alpha", type=float, default=0.01)
    p.add_argument("--unroll_steps", type=int, default=1)
    p.add_argument("--precision", type=str, default="fp32")
    p.add_argument("--strategy", type=str, default="default")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--valid_step", type=int, default=1000)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--lr_schedule", action="store_true")
    p.add_argument("--lr_milestones", type=str, default=None,
                   help="comma-separated steps for the reference's "
                        "MultiStepLR, e.g. '10000,13000'")
    p.add_argument("--compile_blocks", action="store_true")
    # keep the dataset resident in HBM (one upfront transfer; batches are
    # device-side gathers) - the fast path on tunneled TPU runtimes
    p.add_argument("--device_data", action="store_true")
    # --- real-data options (reference workload definition) ---
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="CIFAR-10 pickle dir or npz; synthetic if unset")
    p.add_argument("--num_meta", type=int, default=1000,
                   help="balanced meta-set size (reference num_meta_total)")
    p.add_argument("--imbalanced_factor", type=float, default=None,
                   help="long-tail factor IF (reference: 200/100/50)")
    p.add_argument("--corruption_type", type=str, default=None,
                   choices=["uniform", "flip1", "flip2"])
    p.add_argument("--corruption_ratio", type=float, default=0.0)
    p.add_argument("--data_seed", type=int, default=1)
    p.add_argument("--augment", action="store_true",
                   help="host-side random crop + flip on train batches")
    # --- reference main.py:23-24 one-flag modes ---
    p.add_argument("--baseline", action="store_true",
                   help="single-level uniform-loss training (no reweighter)")
    p.add_argument("--retrain", action="store_true",
                   help="single-level retrain on the kept set, sampling "
                        "weighted by saved per-example weights")
    p.add_argument("--reweight_path", type=str, default="reweight.npz",
                   help="npz with weights/indexes/labels (see "
                        "--export_weights); consumed by --retrain")
    p.add_argument("--export_weights", type=str, default=None,
                   help="after bilevel training, save the reweighter's "
                        "per-example weights npz for --retrain")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="save engine checkpoint on validation improvement")
    # synthetic-mode sizes
    p.add_argument("--train_size", type=int, default=4096)
    p.add_argument("--meta_size", type=int, default=1024)
    return p.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    engine = build_engine(args)
    engine.run()
    if args.export_weights and not (args.baseline or args.retrain):
        export_sample_weights(engine, args.export_weights)
    if engine.test_data is not None:
        print(f"IF {args.imbalanced_factor} || Best Acc.: {engine.best_acc}")
