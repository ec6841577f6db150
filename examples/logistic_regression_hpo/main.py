"""Bilevel logistic-regression hyperparameter optimization.

Capability port of reference ``examples/logistic_regression_hpo/``: the
outer problem learns a per-parameter weight-decay vector; the inner problem
fits logistic regression under that penalty. Solver selectable (cg/darts/
neumann), ``unroll_steps=100`` with inner re-initialization each unroll
(``on_inner_loop_start``) and an outer clamp ``param_callback`` — exactly
the reference's program shape (logistic_regression_implicit.py:75-118).
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
from betty_tpu.module import from_fn


def make_data(seed=0, n=1000, dim=20):
    rng = np.random.RandomState(seed)
    w_gt = rng.randn(dim)
    x = rng.randn(n, dim)
    y = ((x @ w_gt + 0.1 * rng.randn(n)) > 0).astype(np.float32)
    half = n // 2
    return (
        (jnp.asarray(x[:half], jnp.float32), jnp.asarray(y[:half])),
        (jnp.asarray(x[half:], jnp.float32), jnp.asarray(y[half:])),
    )


def bce(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


class Outer(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.inner(inputs)[0]
        loss = bce(outs, targets)
        acc = ((outs > 0) == (targets > 0.5)).mean() * 100
        return {"loss": loss, "acc": acc}

    def param_callback(self):
        self.set_params(
            jax.tree_util.tree_map(lambda p: jnp.clip(p, min=1e-8), self.params)
        )


class Inner(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs, params = self.module(inputs)
        reg = 0.5 * jnp.sum(self.outer() * params * params)
        return bce(outs, targets) + reg

    def on_inner_loop_start(self):
        self.set_params(jax.tree_util.tree_map(jnp.zeros_like, self.params))


def build_engine(args):
    train, valid = make_data(seed=args.seed, dim=args.dim)

    solver_cfg = {
        "cg": Config(type="cg", cg_iterations=3, cg_alpha=1.0,
                     unroll_steps=args.unroll_steps),
        "darts": Config(type="darts", unroll_steps=args.unroll_steps),
        "neumann": Config(type="neumann", neumann_iterations=3,
                          unroll_steps=args.unroll_steps),
    }[args.solver]

    outer = Outer(
        name="outer",
        module=from_fn(lambda p: p["w"], {"w": jnp.ones(args.dim)}),
        optimizer=optim.sgd(lr=args.outer_lr, momentum=0.9),
        train_data_loader=[valid],
        config=Config(log_step=args.log_step, retain_graph=True),
    )
    inner = Inner(
        name="inner",
        module=from_fn(lambda p, x: (x @ p["w"], p["w"]),
                       {"w": jnp.zeros(args.dim)}),
        optimizer=optim.sgd(lr=args.inner_lr),
        train_data_loader=[train],
        config=solver_cfg,
    )
    return Engine(
        config=EngineConfig(train_iters=args.train_iters,
                            compile_blocks=args.compile_blocks),
        problems=[outer, inner],
        dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
    ), outer


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--solver", default="cg", choices=["cg", "darts", "neumann"])
    p.add_argument("--train_iters", type=int, default=2000)
    p.add_argument("--unroll_steps", type=int, default=100)
    p.add_argument("--inner_lr", type=float, default=0.1)
    p.add_argument("--outer_lr", type=float, default=1.0)
    p.add_argument("--dim", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--compile_blocks", action="store_true")
    args = p.parse_args()

    engine, outer = build_engine(args)
    engine.run()
    ctx = {n: {"params": s["params"], "extra": s["extra"]}
           for n, s in engine.states.items()}
    loss, stats, _ = outer.eval_loss(ctx, outer.cur_batch)
    print(f"final outer loss: {float(loss):.4f}")
