"""Learning-by-ignoring: trilevel domain-adaptation program.

Capability port of reference ``examples/learning_by_ignoring/main.py``
(3 problems: reweight <- {pretrain -> finetune -> reweight}; dependency
graph ``u2l={reweight:[pretrain]}``,
``l2u={pretrain:[finetune, reweight], finetune:[reweight]}`` — two
hypergradient paths into ``reweight``, darts solver on each edge,
``unroll_steps=1``). Synthetic source/target domains by default;
``--data-dir`` ingests an OfficeHome-style npz of pre-extracted features
(``x_src/y_src/x_tgt/y_tgt/x_val/y_val/x_test/y_test`` — the reference
trains on ResNet features per domain pair), with target-test accuracy
validation.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.models import MLP
from betty_tpu.module import from_flax, from_fn


def make_domain(n, dim, num_classes, seed, shift=0.0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(num_classes, dim) * 2 + shift
    y = rng.randint(0, num_classes, n)
    x = centers[y] + rng.randn(n, dim)
    return x.astype(np.float32), y.astype(np.int32)


def ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


class Pretrain(ImplicitProblem):
    """Source-domain training with learned per-example ignore weights."""

    def training_step(self, batch):
        x, y, idx = batch
        logits = self.module(x)
        losses = ce(logits, y)
        weights = jax.nn.sigmoid(self.reweight()[idx])
        return jnp.mean(weights * losses)


class Finetune(ImplicitProblem):
    """Target-domain fine-tuning with proximal regularization to the
    pretrained weights (the reference's weight-proximity coupling)."""

    def training_step(self, batch):
        x, y = batch
        logits = self.module(x)
        loss = ce(logits, y).mean()
        prox = sum(
            jnp.sum((a - b) ** 2)
            for a, b in zip(
                jax.tree_util.tree_leaves(self.params),
                jax.tree_util.tree_leaves(self.pretrain.params),
            )
        )
        return loss + self.cfg["rho"] * prox

    def param_groups(self):
        # per-layer learning rates (reference learning_by_ignoring
        # main.py:163-175: feature extractor vs classifier head)
        return [
            {"select": r"Dense_0", "lr": self.cfg["features_lr"]},
            {"select": None, "lr": self.cfg["classifier_lr"]},
        ]


class Reweight(ImplicitProblem):
    """Top level: validation loss of the finetuned model drives the
    per-source-example ignore scores."""

    def training_step(self, batch):
        x, y = batch
        logits = self.finetune(x)
        loss = ce(logits, y).mean()
        acc = (logits.argmax(axis=1) == y).mean() * 100
        return {"loss": loss, "acc": acc}


class LBIEngine(Engine):
    """Target-test accuracy of the finetuned model at each validation."""

    test_data = None

    def validation(self):
        if self.test_data is None:
            return {}
        from vision_data import problem_accuracy

        x, y = self.test_data
        return {"test_acc": problem_accuracy(self.finetune, x, y)}


def build_engine(args):
    test_data = None
    if getattr(args, "data_dir", None):
        d = np.load(args.data_dir)
        xs = np.asarray(d["x_src"], np.float32)
        ys = np.asarray(d["y_src"], np.int32)
        xt = np.asarray(d["x_tgt"], np.float32)
        yt = np.asarray(d["y_tgt"], np.int32)
        xv = np.asarray(d["x_val"], np.float32)
        yv = np.asarray(d["y_val"], np.int32)
        if "x_test" in d:
            test_data = (np.asarray(d["x_test"], np.float32),
                         np.asarray(d["y_test"], np.int32))
        args.n_source, args.n_target = len(ys), len(yt)
        args.dim = xs.shape[1]
        args.classes = int(max(ys.max(), yt.max())) + 1
    else:
        xs, ys = make_domain(args.n_source, args.dim, args.classes, 0,
                             shift=0.0)
        xt, yt = make_domain(args.n_target, args.dim, args.classes, 1,
                             shift=0.5)
        xv, yv = make_domain(args.n_target, args.dim, args.classes, 2,
                             shift=0.5)

    idx = np.arange(args.n_source, dtype=np.int32)
    src_loader = [
        (xs[i : i + args.batch], ys[i : i + args.batch], idx[i : i + args.batch])
        for i in range(0, args.n_source - args.batch + 1, args.batch)
    ]
    tgt_loader = [
        (xt[i : i + args.batch], yt[i : i + args.batch])
        for i in range(0, args.n_target - args.batch + 1, args.batch)
    ]
    val_loader = [
        (xv[i : i + args.batch], yv[i : i + args.batch])
        for i in range(0, args.n_target - args.batch + 1, args.batch)
    ]

    def make_net(seed):
        return from_flax(
            MLP(features=[64, args.classes]),
            jnp.zeros((args.batch, args.dim)),
            rng=jax.random.PRNGKey(seed),
        )

    pretrain = Pretrain(
        name="pretrain", module=make_net(0),
        optimizer=optim.sgd(lr=args.lr, momentum=0.9),
        train_data_loader=src_loader,
        config=Config(type="darts", unroll_steps=1, allow_unused=False),
    )
    finetune = Finetune(
        name="finetune", module=make_net(1),
        optimizer=optim.sgd(lr=args.lr, momentum=0.9),
        train_data_loader=tgt_loader,
        config=Config(type="darts", unroll_steps=1, allow_unused=False),
        extra_config={"rho": args.rho,
                      "features_lr": args.features_lr,
                      "classifier_lr": args.classifier_lr},
    )
    reweight = Reweight(
        name="reweight",
        module=from_fn(lambda p: p["scores"],
                       {"scores": jnp.zeros(args.n_source)}),
        optimizer=optim.adam(lr=args.meta_lr),
        train_data_loader=val_loader,
        config=Config(type="darts", unroll_steps=1, log_step=args.log_step),
    )

    engine = LBIEngine(
        config=EngineConfig(train_iters=args.train_iters,
                            valid_step=getattr(args, "valid_step", 1000)),
        problems=[reweight, finetune, pretrain],
        dependencies={
            "u2l": {reweight: [pretrain]},
            "l2u": {pretrain: [finetune, reweight], finetune: [reweight]},
        },
    )
    engine.test_data = test_data
    return engine


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--classes", type=int, default=5)
    p.add_argument("--n_source", type=int, default=512)
    p.add_argument("--n_target", type=int, default=256)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--features_lr", type=float, default=0.05)
    p.add_argument("--classifier_lr", type=float, default=0.05)
    p.add_argument("--meta_lr", type=float, default=0.01)
    p.add_argument("--rho", type=float, default=0.1)
    p.add_argument("--train_iters", type=int, default=200)
    p.add_argument("--valid_step", type=int, default=1000)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="OfficeHome-style feature npz; synthetic if unset")
    return p.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    engine = build_engine(args)
    engine.run()
    print("ignore-score stats:",
          float(jnp.mean(jax.nn.sigmoid(engine.states["reweight"]["params"]["scores"]))))
