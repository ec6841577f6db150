"""Shared bilevel logistic-regression HPO fixture.

Same synthetic problem family as the reference's entire test suite
(``test/test_engine.py:20-90``, ``test/test_regression.py:13-60``):
ChildNet = bare 20-dim weight vector; ParentNet = per-parameter weight decay;
inner loss = BCE + 0.5 * w^T diag(lambda) w; outer loss = BCE on held-out data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.module import from_fn

DIM = 20


def make_data(seed=0, n=1000, dim=DIM):
    rng = np.random.RandomState(seed)
    w_gt = rng.randn(dim)
    x = rng.randn(n, dim)
    y = ((x @ w_gt + 0.1 * rng.randn(n)) > 0).astype(np.float32)
    half = n // 2
    train = (jnp.asarray(x[:half], jnp.float32), jnp.asarray(y[:half]))
    valid = (jnp.asarray(x[half:], jnp.float32), jnp.asarray(y[half:]))
    return train, valid


def bce(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


class Outer(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.inner(inputs)[0]
        return bce(outs, targets)

    def param_callback(self):
        self.set_params(
            jax.tree_util.tree_map(lambda p: jnp.clip(p, min=1e-8), self.params)
        )


class Inner(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs, params = self.module(inputs)
        return bce(outs, targets) + 0.5 * jnp.sum(self.outer() * params * params)

    def on_inner_loop_start(self):
        self.set_params(jax.tree_util.tree_map(jnp.zeros_like, self.params))


def child_module(dim=DIM, w0=None):
    w = jnp.zeros(dim) if w0 is None else jnp.asarray(w0, jnp.float32)
    return from_fn(lambda p, inputs: (inputs @ p["w"], p["w"]), {"w": w})


def parent_module(dim=DIM, w0=None):
    w = jnp.ones(dim) if w0 is None else jnp.asarray(w0, jnp.float32)
    return from_fn(lambda p: p["w"], {"w": w})


def make_engine(inner_config, engine_config=None, seed=0,
                outer_optimizer=None, inner_optimizer=None,
                engine_cls=Engine):
    train, valid = make_data(seed)
    outer = Outer(
        name="outer",
        module=parent_module(),
        optimizer=outer_optimizer or optim.sgd(lr=1.0, momentum=0.9),
        train_data_loader=[valid],
        config=Config(),
    )
    inner = Inner(
        name="inner",
        module=child_module(),
        optimizer=inner_optimizer or optim.sgd(lr=0.1),
        train_data_loader=[train],
        config=inner_config,
    )
    engine = engine_cls(
        config=engine_config or EngineConfig(train_iters=2000),
        problems=[outer, inner],
        dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
    )
    return engine, outer, inner


def final_outer_loss(engine, outer):
    ctx = {
        n: {"params": s["params"], "extra": s["extra"]}
        for n, s in engine.states.items()
    }
    loss, _, _ = outer.eval_loss(ctx, outer.cur_batch)
    return float(loss)
