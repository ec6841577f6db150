"""Tutorial 3 — logging (reference tutorial/3_logging.py).

``logger_type`` selects the sink (none/tensorboard/wandb); per-problem
``log_step`` controls cadence; ``training_step`` may return a dict of
metrics alongside "loss".
"""

from common import (
    Classifier,
    Loader,
    Reweight,
    classifier_module,
    make_imbalanced_mnist,
    reweight_module,
)

from betty_tpu import Config, Engine, EngineConfig, optim

x_train, y_train = make_imbalanced_mnist(imbalance=20, seed=0)
x_meta, y_meta = make_imbalanced_mnist(n=256, imbalance=1, seed=1)

classifier = Classifier(
    name="classifier",
    module=classifier_module(128),
    optimizer=optim.sgd(lr=0.1, momentum=0.9),
    train_data_loader=Loader(x_train, y_train, 128),
    config=Config(type="darts", unroll_steps=1, log_step=100),
)
reweight = Reweight(
    name="reweight",
    module=reweight_module(128),
    optimizer=optim.adam(lr=1e-4),
    train_data_loader=Loader(x_meta, y_meta, 128, seed=1),
    config=Config(type="darts", log_step=100),
)
engine = Engine(
    config=EngineConfig(train_iters=1000, logger_type="tensorboard"),
    problems=[reweight, classifier],
    dependencies={"u2l": {reweight: [classifier]},
                  "l2u": {classifier: [reweight]}},
)
engine.run()
