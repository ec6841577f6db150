"""Tutorial 4 — memory & precision (reference tutorial/4_memory_optimization.py).

The reference demonstrates fp16 + GradScaler; on TPU the native half
precision is bfloat16 (``precision="bf16"``) with no loss scaling needed —
parameters stay fp32 masters, forwards compute in bf16 on the MXU. Gradient
accumulation (``gradient_accumulation``) trades memory for larger effective
batches; ``first_order=True`` (default) keeps hypergradients memory-lean via
the darts/sama finite-difference solvers.
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
    module=classifier_module(64),
    optimizer=optim.sgd(lr=0.1, momentum=0.9),
    train_data_loader=Loader(x_train, y_train, 64),
    config=Config(
        type="darts",
        unroll_steps=1,
        precision="bf16",            # TPU-native mixed precision
        gradient_accumulation=2,     # effective batch 128
        log_step=500,
    ),
)
reweight = Reweight(
    name="reweight",
    module=reweight_module(64),
    optimizer=optim.adam(lr=1e-4),
    train_data_loader=Loader(x_meta, y_meta, 64, seed=1),
    config=Config(type="darts", precision="bf16", log_step=500),
)
engine = Engine(
    config=EngineConfig(train_iters=2000),
    problems=[reweight, classifier],
    dependencies={"u2l": {reweight: [classifier]},
                  "l2u": {classifier: [reweight]}},
)
engine.run()
