"""Tutorial 2 — validation (reference tutorial/2_validation.py).

Subclass Engine and implement ``validation()``; it runs every
``valid_step`` iterations with all problems in eval mode.
"""

import jax.numpy as jnp
import numpy as np

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
x_test, y_test = make_imbalanced_mnist(n=512, imbalance=1, seed=2)


class ReweightingEngine(Engine):
    def validation(self):
        correct, total = 0, 0
        for i in range(0, len(x_test), 128):
            xb = jnp.asarray(x_test[i : i + 128])
            yb = y_test[i : i + 128]
            logits = np.asarray(self.classifier.module(xb))
            correct += (logits.argmax(axis=1) == yb).sum()
            total += len(yb)
        return {"acc": 100.0 * correct / total}


classifier = Classifier(
    name="classifier",
    module=classifier_module(128),
    optimizer=optim.sgd(lr=0.1, momentum=0.9),
    train_data_loader=Loader(x_train, y_train, 128),
    config=Config(type="darts", unroll_steps=1),
)
reweight = Reweight(
    name="reweight",
    module=reweight_module(128),
    optimizer=optim.adam(lr=1e-4),
    train_data_loader=Loader(x_meta, y_meta, 128, seed=1),
    config=Config(type="darts"),
)
engine = ReweightingEngine(
    config=EngineConfig(train_iters=3000, valid_step=500),
    problems=[reweight, classifier],
    dependencies={"u2l": {reweight: [classifier]},
                  "l2u": {classifier: [reweight]}},
)
engine.run()
