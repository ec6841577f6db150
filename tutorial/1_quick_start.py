"""Tutorial 1 — quick start (reference tutorial/1_quick_start.py).

A bilevel data-reweighting program in ~30 lines of user code: two Problems,
a dependency dict, an Engine. Run with --baseline to train the classifier
alone and compare.
"""

import argparse

from common import (
    Classifier,
    Loader,
    Reweight,
    classifier_module,
    make_imbalanced_mnist,
    reweight_module,
)

from betty_tpu import Config, Engine, EngineConfig, optim

parser = argparse.ArgumentParser()
parser.add_argument("--baseline", action="store_true")
parser.add_argument("--train_iters", type=int, default=3000)
parser.add_argument("--batch_size", type=int, default=128)
args = parser.parse_args()

x_train, y_train = make_imbalanced_mnist(imbalance=20, seed=0)
x_meta, y_meta = make_imbalanced_mnist(n=256, imbalance=1, seed=1)

classifier = Classifier(
    name="classifier",
    module=classifier_module(args.batch_size),
    optimizer=optim.sgd(lr=0.1, momentum=0.9),
    train_data_loader=Loader(x_train, y_train, args.batch_size),
    config=Config(type="darts", unroll_steps=1, log_step=500),
)
reweight = Reweight(
    name="reweight",
    module=reweight_module(args.batch_size),
    optimizer=optim.adam(lr=1e-4),
    train_data_loader=Loader(x_meta, y_meta, args.batch_size, seed=1),
    config=Config(type="darts", log_step=500),
)

if args.baseline:
    # single-level: no reweighting
    import jax.numpy as jnp
    import optax as _optax

    class Plain(Classifier):
        def training_step(self, batch):
            inputs, labels = batch
            outputs = self.module(inputs)
            return _optax.softmax_cross_entropy_with_integer_labels(
                outputs, labels
            ).mean()

    classifier = Plain(
        name="classifier",
        module=classifier_module(args.batch_size),
        optimizer=optim.sgd(lr=0.1, momentum=0.9),
        train_data_loader=Loader(x_train, y_train, args.batch_size),
        config=Config(log_step=500),
    )
    engine = Engine(
        config=EngineConfig(train_iters=args.train_iters),
        problems=[classifier],
        dependencies={"u2l": {}, "l2u": {}},
    )
else:
    engine = Engine(
        config=EngineConfig(train_iters=args.train_iters),
        problems=[reweight, classifier],
        dependencies={"u2l": {reweight: [classifier]},
                      "l2u": {classifier: [reweight]}},
    )

engine.run()
