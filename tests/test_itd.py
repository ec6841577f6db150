"""Iterative differentiation (ITD / MAML): the meta-gradient through the
unrolled inner optimization must equal the exact hand-computed derivative
through the unroll (what the reference obtains from functorch/higher +
differentiable optimizers, betty/problems/iterative_problem*.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, IterativeProblem, optim
from betty_tpu.module import from_fn

D = 5
INNER_STEPS = 3
INNER_LR = 0.1
META_LR = 0.5

rng = np.random.RandomState(7)
T_INNER = rng.randn(D).astype(np.float32)   # inner target
T_OUTER = rng.randn(D).astype(np.float32)   # meta target
THETA0 = rng.randn(D).astype(np.float32)    # meta init


def inner_loss_np(w, t):
    return 0.5 * jnp.sum((w - t) ** 2)


class Meta(ImplicitProblem):
    def training_step(self, batch):
        # loss of adapted inner params vs the meta target
        w = self.adapt.params["w"]
        return 0.5 * jnp.sum((w - batch) ** 2)


class Adapt(IterativeProblem):
    def training_step(self, batch):
        return inner_loss_np(self.module(), batch)

    def on_inner_loop_start(self):
        # warm start from meta params (eager, concrete)
        self.set_params({"w": self.meta.params["w"]})

    def unroll_init(self, start_params):
        # differentiable coupling: inner init IS the meta parameter
        return {"w": self.meta.params["w"]}


def expected_meta_params():
    """Exact MAML gradient: unroll 3 plain-SGD steps from theta, loss at the
    end, one SGD meta step."""

    def adapted(theta):
        w = theta
        for _ in range(INNER_STEPS):
            g = jax.grad(lambda wi: 0.5 * jnp.sum((wi - jnp.asarray(T_INNER)) ** 2))(w)
            w = w - INNER_LR * g
        return w

    def meta_loss(theta):
        w = adapted(theta)
        return 0.5 * jnp.sum((w - jnp.asarray(T_OUTER)) ** 2)

    g = jax.grad(meta_loss)(jnp.asarray(THETA0))
    return np.asarray(jnp.asarray(THETA0) - META_LR * g)


def test_maml_meta_gradient_exact():
    meta = Meta(
        "meta",
        module=from_fn(lambda p: p["w"], {"w": jnp.asarray(THETA0)}),
        optimizer=optim.sgd(lr=META_LR),
        train_data_loader=[jnp.asarray(T_OUTER)],
        config=Config(first_order=False),  # ITD: differentiate through unroll
    )
    adapt = Adapt(
        "adapt",
        module=from_fn(lambda p: p["w"], {"w": jnp.zeros(D)}),
        optimizer=optim.sgd(lr=INNER_LR),
        train_data_loader=[jnp.asarray(T_INNER)],
        config=Config(unroll_steps=INNER_STEPS),
    )
    engine = Engine(
        config=EngineConfig(train_iters=INNER_STEPS),
        problems=[meta, adapt],
        dependencies={"u2l": {meta: [adapt]}, "l2u": {adapt: [meta]}},
    )
    engine.run()
    assert adapt.count == INNER_STEPS and meta.count == 1
    got = np.asarray(engine.states["meta"]["params"]["w"])
    want = expected_meta_params()
    assert np.max(np.abs(got - want)) < 1e-5, (got, want)
