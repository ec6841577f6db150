"""DARTS evaluation phase: retrain the searched genotype from scratch.

Capability port of reference ``examples/neural_architecture_search/train.py``
(NetworkCIFAR, 36 channels x 20 cells, auxiliary head weight 0.4, scheduled
drop-path, cutout augmentation, cosine LR, grad clip 5). The discrete network
lives in ``betty_tpu/models/darts.py`` (``DARTSEvalNetwork``); here it is a
single-problem Engine program — the framework's single-level degenerate case.

The genotype comes from ``--genotype-file`` (JSON written by ``main.py``'s
search, see ``genotype_to_json``) or defaults to the published DARTS_V2.
Synthetic CIFAR-shaped data by default; ``--data-dir`` ingests real CIFAR-10.

Run:  python train.py --epochs 2                 # synthetic smoke run
      python train.py --data-dir ~/cifar10 --epochs 600 --auxiliary --cutout
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.models.darts import (
    DARTS_V2,
    DARTSEvalNetwork,
    genotype_from_json,
)
from betty_tpu.module import from_flax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "learning_to_reweight"))
from main import BatchLoader, make_synthetic_cifar  # noqa: E402
from vision_data import load_classification, problem_accuracy  # noqa: E402


def cutout_batch(x, length, rng):
    """Cutout augmentation (reference ``utils.Cutout``): zero a random
    length x length square per image."""
    n, h, w, _ = x.shape
    ys = rng.randint(0, h, n)
    xs = rng.randint(0, w, n)
    x = x.copy()
    for i in range(n):
        y0, y1 = max(0, ys[i] - length // 2), min(h, ys[i] + length // 2)
        x0, x1 = max(0, xs[i] - length // 2), min(w, xs[i] + length // 2)
        x[i, y0:y1, x0:x1, :] = 0.0
    return x


class EvalLoader(BatchLoader):
    """Training loader that appends the scheduled drop-path probability to
    each batch (reference scales ``drop_path_prob`` linearly with epoch,
    ``train.py`` main loop). Threading it through the batch keeps it a traced
    scalar — the compiled step never recompiles as the schedule advances."""

    def __init__(self, x, y, batch_size, *, drop_path_prob, epochs,
                 cutout_length=0, **kw):
        super().__init__(x, y, batch_size, **kw)
        # postprocess always transforms (appends the drop-path scalar), so
        # never eligible for the identity-postprocess fast path
        self.postprocess_is_identity = False
        self.drop_path_prob = drop_path_prob
        self.epochs = max(epochs, 1)
        self.cutout_length = cutout_length
        self._cut_rng = np.random.RandomState(kw.get("seed", 0) + 123)

    def postprocess(self, batch):
        x, y = super().postprocess(batch)
        if self.cutout_length > 0:
            x = cutout_batch(np.asarray(x), self.cutout_length, self._cut_rng)
        dp = self.drop_path_prob * min(self.epoch / self.epochs, 1.0)
        return x, y, np.float32(dp)


class Network(ImplicitProblem):
    aux_weight = 0.4

    def training_step(self, batch):
        x, y, dp = batch
        logits, aux = self.module(x, dp)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()
        if aux is not None:
            aux_loss = optax.softmax_cross_entropy_with_integer_labels(
                aux, y
            ).mean()
            loss = loss + self.aux_weight * aux_loss
        acc = (logits.argmax(axis=1) == y).mean() * 100
        return {"loss": loss, "acc": acc}


class EvalEngine(Engine):
    test_data = None
    ckpt_dir = None
    best_acc = -1.0

    def validation(self):
        if self.test_data is None:
            return {}
        x, y = self.test_data
        net = self.network
        acc = problem_accuracy(
            lambda xb: net.module(xb)[0], x, y
        )  # already in percent
        if acc > self.best_acc:
            self.best_acc = acc
            if self.ckpt_dir:
                self.save_checkpoint(self.ckpt_dir)
        return {"test_acc": acc, "best_acc": self.best_acc}


def build_engine(args):
    if args.genotype_file:
        genotype = genotype_from_json(Path(args.genotype_file).read_text())
    else:
        genotype = DARTS_V2

    if args.data_dir:
        x_tr, y_tr, x_te, y_te = load_classification(args.data_dir)
        num_classes = int(y_tr.max()) + 1
    else:
        x_tr, y_tr = make_synthetic_cifar(args.train_size, seed=0)
        x_te, y_te = make_synthetic_cifar(1024, seed=9)
        num_classes = 10

    steps_per_epoch = max(len(x_tr) // args.batch_size, 1)
    total_steps = steps_per_epoch * args.epochs

    net = DARTSEvalNetwork(
        genotype,
        channels=args.init_channels,
        layers=args.layers,
        num_classes=num_classes,
        auxiliary=args.auxiliary,
    )
    sample = np.zeros((args.batch_size, 32, 32, 3), np.float32)
    module = from_flax(net, sample, 0.0, rng=jax.random.PRNGKey(args.seed),
                       train_kwarg="train", rng_names=("dropout", "droppath"),
                       init_train=True)

    loader = EvalLoader(
        x_tr, y_tr, args.batch_size,
        drop_path_prob=args.drop_path_prob, epochs=args.epochs,
        cutout_length=args.cutout_length if args.cutout else 0,
        augment=args.data_dir is not None, seed=args.seed,
    )
    network = Network(
        "network",
        module=module,
        optimizer=optim.sgd(
            lr=args.learning_rate,
            momentum=args.momentum,
            weight_decay=args.weight_decay,
            schedule=optim.cosine_lr(args.learning_rate, total_steps),
        ),
        train_data_loader=loader,
        config=Config(gradient_clipping=args.grad_clip),
    )
    engine = EvalEngine(
        config=EngineConfig(
            train_iters=total_steps,
            valid_step=steps_per_epoch * args.valid_every_epochs,
            logger_type=args.logger,
        ),
        problems=[network],
        dependencies={"u2l": {}, "l2u": {}},
    )
    engine.test_data = (x_te, y_te)
    engine.ckpt_dir = args.checkpoint_dir
    return engine


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--genotype-file", type=str, default=None,
                   help="JSON genotype from the search phase (default: DARTS_V2)")
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None)
    p.add_argument("--train_size", type=int, default=512,
                   help="synthetic dataset size when no --data-dir")
    p.add_argument("--batch_size", type=int, default=96)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--init_channels", type=int, default=36)
    p.add_argument("--layers", type=int, default=20)
    p.add_argument("--learning_rate", type=float, default=0.025)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=3e-4)
    p.add_argument("--grad_clip", type=float, default=5.0)
    p.add_argument("--auxiliary", action="store_true")
    p.add_argument("--drop_path_prob", type=float, default=0.2)
    p.add_argument("--cutout", action="store_true")
    p.add_argument("--cutout_length", type=int, default=16)
    p.add_argument("--valid_every_epochs", type=int, default=1)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--logger", type=str, default="none")
    p.add_argument("--seed", type=int, default=2)
    return p.parse_args(argv)


if __name__ == "__main__":
    engine = build_engine(parse_args())
    engine.run()
