"""Tutorial 5 — distributed training (reference tutorial/5_distributed_training.py).

One config line scales the program across a TPU mesh:

* ``strategy="dp"``     — data parallel: batch sharded over devices,
                          parameters replicated (reference "distributed")
* ``strategy="zero"``   — + optimizer state sharded (ZeRO-1)
* ``strategy="fsdp"``   — + parameters/gradients sharded

No launcher, no process groups, no module wrapping: one process drives all
local devices and XLA inserts the collectives (the reference needs torchrun
+ DDP hooks + a distributed batch sampler for the same thing). Try it
without TPUs:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python tutorial/5_distributed_training.py --strategy dp
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
parser.add_argument("--strategy", default="dp",
                    choices=["default", "dp", "zero", "fsdp"])
parser.add_argument("--train_iters", type=int, default=1000)
args = parser.parse_args()

x_train, y_train = make_imbalanced_mnist(imbalance=20, seed=0)
x_meta, y_meta = make_imbalanced_mnist(n=256, imbalance=1, seed=1)

classifier = Classifier(
    name="classifier",
    module=classifier_module(128),
    optimizer=optim.sgd(lr=0.1, momentum=0.9),
    train_data_loader=Loader(x_train, y_train, 128),
    config=Config(type="darts", unroll_steps=1, log_step=200),
)
reweight = Reweight(
    name="reweight",
    module=reweight_module(128),
    optimizer=optim.adam(lr=1e-4),
    train_data_loader=Loader(x_meta, y_meta, 128, seed=1),
    config=Config(type="darts", log_step=200),
)
engine = Engine(
    config=EngineConfig(train_iters=args.train_iters, strategy=args.strategy),
    problems=[reweight, classifier],
    dependencies={"u2l": {reweight: [classifier]},
                  "l2u": {classifier: [reweight]}},
)
engine.run()
