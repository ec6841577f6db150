"""End-to-end QUALITY checks: the meta-gradients must actually steer the
upper problem — not merely run. With 40% label noise, per-example ignore
scores (learning-by-ignoring-style bilevel) learned against a clean meta set
must downweight exactly the flipped examples and lift test accuracy over the
plain baseline. (The reference's analogue is its accuracy tables; this is
the synthetic, CI-runnable version.)"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.data import ArrayLoader
from betty_tpu.models import MLP
from betty_tpu.module import from_flax, from_fn

DIM = 32
N = 512
FLIP = 0.4


def make_clean(n, seed):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, n)
    protos = np.stack([np.ones(DIM), -np.ones(DIM)])
    x = (protos[y] * 0.4 + rng.randn(n, DIM)).astype(np.float32)
    return x, y.astype(np.int32)


class Ignore(ImplicitProblem):
    def training_step(self, batch):
        x, y = batch
        logits = self.classifier(x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        x, y, idx = batch
        logits = self.module(x)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        w = jax.nn.sigmoid(self.ignore()[idx])
        return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-6)


class Plain(ImplicitProblem):
    def training_step(self, batch):
        x, y = batch[0], batch[1]
        logits = self.module(x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


def accuracy(module_fn, state, x, y):
    logits = module_fn.apply_fn(
        {"params": state["params"], **state["extra"]}, jnp.asarray(x)
    )
    return float((np.asarray(logits.argmax(axis=1)) == y).mean())


def test_ignore_scores_find_label_noise():
    rng = np.random.RandomState(0)
    x_tr, y_clean = make_clean(N, 0)
    y_tr = y_clean.copy()
    flips = rng.rand(N) < FLIP
    y_tr[flips] = 1 - y_tr[flips]
    idx = np.arange(N, dtype=np.int32)
    x_me, y_me = make_clean(128, 1)
    x_te, y_te = make_clean(1024, 2)

    def classifier_module():
        return from_flax(MLP(features=[128, 64, 2]), jnp.zeros((64, DIM)),
                         rng=jax.random.PRNGKey(0))

    # baseline: plain training on the noisy labels
    plain = Plain("classifier", module=classifier_module(),
                  optimizer=optim.sgd(lr=0.05, momentum=0.9),
                  train_data_loader=ArrayLoader(x_tr, y_tr, batch_size=64),
                  config=Config())
    eng0 = Engine(config=EngineConfig(train_iters=1500), problems=[plain],
                  dependencies={"u2l": {}, "l2u": {}})
    eng0.run()
    base_acc = accuracy(plain.module_fn, eng0.states["classifier"], x_te, y_te)

    # bilevel: per-example ignore scores against a clean meta set
    classifier = Classifier(
        "classifier", module=classifier_module(),
        optimizer=optim.sgd(lr=0.05, momentum=0.9),
        train_data_loader=ArrayLoader(x_tr, y_tr, idx, batch_size=64),
        config=Config(type="darts", unroll_steps=1),
    )
    ignore = Ignore(
        "ignore", module=from_fn(lambda p: p["s"], {"s": jnp.zeros(N)}),
        optimizer=optim.adam(lr=0.03),
        train_data_loader=ArrayLoader(x_me, y_me, batch_size=64, seed=1),
        config=Config(),
    )
    eng1 = Engine(config=EngineConfig(train_iters=1500),
                  problems=[ignore, classifier],
                  dependencies={"u2l": {ignore: [classifier]},
                                "l2u": {classifier: [ignore]}})
    eng1.run()

    weights = np.asarray(jax.nn.sigmoid(eng1.states["ignore"]["params"]["s"]))
    clean_w, noisy_w = weights[~flips].mean(), weights[flips].mean()
    mlo_acc = accuracy(
        classifier.module_fn, eng1.states["classifier"], x_te, y_te
    )
    print(f"clean-example weight {clean_w:.3f}, noisy {noisy_w:.3f}; "
          f"acc base {base_acc:.3f} -> reweighted {mlo_acc:.3f}")

    # the meta-gradient must separate flipped from clean examples...
    assert clean_w > noisy_w + 0.3, (clean_w, noisy_w)
    # ...and that separation must buy real test accuracy
    assert mlo_acc > base_acc + 0.05, (base_acc, mlo_acc)


def test_remat_matches_plain():
    """Config(remat=True) changes memory behavior, not numerics."""
    x_tr, y_tr = make_clean(256, 0)
    outs = []
    for remat in (False, True):
        plain = Plain("classifier",
                      module=from_flax(MLP(features=[32, 2]),
                                       jnp.zeros((64, DIM)),
                                       rng=jax.random.PRNGKey(0)),
                      optimizer=optim.sgd(lr=0.05),
                      train_data_loader=ArrayLoader(x_tr, y_tr,
                                                    batch_size=64),
                      config=Config(remat=remat))
        eng = Engine(config=EngineConfig(train_iters=10), problems=[plain],
                     dependencies={"u2l": {}, "l2u": {}})
        eng.run()
        outs.append(
            np.concatenate([
                np.asarray(x).ravel()
                for x in jax.tree_util.tree_leaves(
                    eng.states["classifier"]["params"])
            ])
        )
    assert np.max(np.abs(outs[0] - outs[1])) < 1e-6
