"""Install smoke test (counterpart of reference ``betty/test_install.py``):
a self-contained bilevel logistic-regression HPO run with the CG solver that
prints "Hello (Betty-TPU) World" on success.

Run:  python -m betty_tpu.test_install
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.module import from_fn


def main(train_iters=2000, dim=20, seed=0):
    rng = np.random.RandomState(seed)
    w_gt = rng.randn(dim)
    x = rng.randn(1000, dim)
    y = ((x @ w_gt + 0.1 * rng.randn(1000)) > 0).astype(np.float32)
    train = (jnp.asarray(x[:500], jnp.float32), jnp.asarray(y[:500]))
    valid = (jnp.asarray(x[500:], jnp.float32), jnp.asarray(y[500:]))

    def bce(logits, labels):
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

    class Outer(ImplicitProblem):
        def training_step(self, batch):
            inputs, targets = batch
            return bce(self.inner(inputs)[0], targets)

        def param_callback(self):
            self.set_params(jax.tree_util.tree_map(
                lambda p: jnp.clip(p, min=1e-8), self.params))

    class Inner(ImplicitProblem):
        def training_step(self, batch):
            inputs, targets = batch
            outs, params = self.module(inputs)
            return bce(outs, targets) + 0.5 * jnp.sum(
                self.outer() * params * params)

        def on_inner_loop_start(self):
            self.set_params(jax.tree_util.tree_map(
                jnp.zeros_like, self.params))

    outer = Outer(
        name="outer",
        module=from_fn(lambda p: p["w"], {"w": jnp.ones(dim)}),
        optimizer=optim.sgd(lr=1.0, momentum=0.9),
        train_data_loader=[valid],
        config=Config(),
    )
    inner = Inner(
        name="inner",
        module=from_fn(lambda p, i: (i @ p["w"], p["w"]),
                       {"w": jnp.zeros(dim)}),
        optimizer=optim.sgd(lr=0.1),
        train_data_loader=[train],
        config=Config(type="cg", cg_iterations=3, cg_alpha=1.0,
                      unroll_steps=100),
    )
    engine = Engine(
        config=EngineConfig(train_iters=train_iters),
        problems=[outer, inner],
        dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
    )
    engine.run()
    ctx = {n: {"params": s["params"], "extra": s["extra"]}
           for n, s in engine.states.items()}
    loss, _, _ = outer.eval_loss(ctx, outer.cur_batch)
    assert float(loss) < 0.48, f"install check failed (loss={float(loss)})"
    print("Hello (Betty-TPU) World — install OK, final outer loss "
          f"{float(loss):.4f}")


if __name__ == "__main__":
    main()
