"""Saliency-aware NAS: a 4-level program (3 problems + in-problem PGD stage).

Capability port of reference ``examples/saliency_aware_nas_4_level/
train_search_sanas.py``: graph
``u2l={outer:[inner2, inner1]}``, ``l2u={inner1:[inner2, outer],
inner2:[outer]}`` (two hypergradient paths into the arch problem), with
``Inner2`` running a PGD adversarial-attack loop *inside* its training step
(reference :226-260) — here a ``lax.fori_loop`` over input gradients, fully
inside the jitted update. Synthetic data; the program shape and solver
plumbing are the point.
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
from betty_tpu.models import MLP
from betty_tpu.module import from_flax, from_fn


def make_data(n, dim, classes, seed):
    rng = np.random.RandomState(seed)
    centers = rng.randn(classes, dim) * 2
    y = rng.randint(0, classes, n)
    x = (centers[y] + rng.randn(n, dim)).astype(np.float32)
    return x, y.astype(np.int32)


def ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


class Outer(ImplicitProblem):
    """Level 4: architecture weights (feature-saliency mask) on clean val."""

    def training_step(self, batch):
        x, y = batch
        logits = self.inner1(x * jax.nn.sigmoid(self.module()))
        loss = ce(logits, y).mean()
        acc = (logits.argmax(axis=1) == y).mean() * 100
        return {"loss": loss, "acc": acc}


class Inner2(ImplicitProblem):
    """Level 3+2: perturbation-budget learner whose loss includes a PGD
    attack stage (the conceptual 4th level) against the classifier."""

    def training_step(self, batch):
        x, y = batch
        mask = jax.nn.sigmoid(self.outer())
        eps = jax.nn.softplus(self.module())  # learned per-feature budget

        def attack_loss(delta):
            logits = self.inner1((x + delta) * mask)
            return ce(logits, y).mean()

        def pgd_step(_, delta):
            g = jax.grad(attack_loss)(delta)
            delta = delta + self.cfg["pgd_lr"] * jnp.sign(g)
            return jnp.clip(delta, -eps, eps)

        delta = jax.lax.fori_loop(
            0, self.cfg["pgd_steps"], pgd_step, jnp.zeros_like(x)
        )
        # stop gradients through the PGD ITERATIONS but keep the final
        # projection differentiable in eps — it is the only data-dependent
        # path from the robust-gap loss to the budget parameters (without
        # it the budget learner can only shrink eps via the cost term)
        delta = jnp.clip(jax.lax.stop_gradient(delta), -eps, eps)

        adv_logits = self.inner1((x + delta) * mask)
        clean_logits = self.inner1(x * mask)
        robust_gap = ce(adv_logits, y).mean() - ce(clean_logits, y).mean()
        budget_cost = jnp.mean(eps)
        return robust_gap + 0.1 * budget_cost


class Inner1(ImplicitProblem):
    """Level 1: classifier trained on masked + adversarially-budgeted data."""

    def training_step(self, batch):
        x, y = batch
        mask = jax.nn.sigmoid(self.outer())
        logits = self.module(x * mask)
        return ce(logits, y).mean()


class SanasEngine(Engine):
    """Clean + adversarially-masked accuracy on a held-out split (reference
    train_search_sanas.py validates the searched model per epoch)."""

    test_data = None

    def validation(self):
        if self.test_data is None:
            return {}
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from vision_data import problem_accuracy

        x, y = self.test_data
        mask = jax.nn.sigmoid(self.outer())
        acc = problem_accuracy(lambda xb: self.inner1(xb * mask), x, y)
        return {"masked_acc": acc}


def build_engine(args):
    if getattr(args, "data_dir", None):
        # feature npz: x_train/y_train split into thirds for the 3 levels
        d = np.load(args.data_dir)
        x, y = np.asarray(d["x_train"], np.float32), np.asarray(d["y_train"], np.int32)
        x = x.reshape(len(x), -1)
        third = len(y) // 3
        x_tr, y_tr = x[:third], y[:third]
        x_v1, y_v1 = x[third : 2 * third], y[third : 2 * third]
        x_v2, y_v2 = x[2 * third :], y[2 * third :]
        args.dim = x.shape[1]
        args.classes = int(y.max()) + 1
    else:
        x_tr, y_tr = make_data(args.n, args.dim, args.classes, 0)
        x_v1, y_v1 = make_data(args.n, args.dim, args.classes, 1)
        x_v2, y_v2 = make_data(args.n, args.dim, args.classes, 2)

    # genuinely held-out data for validation(): the last 20% of the
    # outer split never enters any level's training loader
    holdout = max(len(y_v2) // 5, 1)
    x_test, y_test = x_v2[-holdout:], y_v2[-holdout:]
    x_v2, y_v2 = x_v2[:-holdout], y_v2[:-holdout]

    def loader(x, y):
        return [(x[i : i + args.batch], y[i : i + args.batch])
                for i in range(0, len(x) - args.batch + 1, args.batch)]

    outer = Outer(
        name="outer",
        module=from_fn(lambda p: p["mask"], {"mask": jnp.zeros(args.dim)}),
        optimizer=optim.adam(lr=args.arch_lr),
        train_data_loader=loader(x_v2, y_v2),  # (test split carved off below)
        config=Config(type="darts", first_order=True, log_step=args.log_step),
    )
    inner2 = Inner2(
        name="inner2",
        module=from_fn(lambda p: p["eps"],
                       {"eps": -2.0 * jnp.ones(args.dim)}),
        optimizer=optim.adam(lr=args.budget_lr),
        train_data_loader=loader(x_v1, y_v1),
        config=Config(type="darts", unroll_steps=args.unroll2),
        extra_config={"pgd_steps": args.pgd_steps, "pgd_lr": args.pgd_lr},
    )
    inner1 = Inner1(
        name="inner1",
        module=from_flax(MLP(features=[64, args.classes]),
                         jnp.zeros((args.batch, args.dim)),
                         rng=jax.random.PRNGKey(0)),
        optimizer=optim.sgd(lr=args.lr, momentum=0.9),
        train_data_loader=loader(x_tr, y_tr),
        config=Config(type="darts", unroll_steps=args.unroll1),
    )
    engine = SanasEngine(
        config=EngineConfig(train_iters=args.train_iters,
                            valid_step=getattr(args, "valid_step", 10 ** 9)),
        problems=[outer, inner2, inner1],
        dependencies={
            "u2l": {outer: [inner2, inner1]},
            "l2u": {inner1: [inner2, outer], inner2: [outer]},
        },
    )
    engine.test_data = (x_test, y_test)
    return engine


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--classes", type=int, default=5)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--arch_lr", type=float, default=1e-3)
    p.add_argument("--budget_lr", type=float, default=1e-3)
    p.add_argument("--pgd_steps", type=int, default=3)
    p.add_argument("--pgd_lr", type=float, default=0.05)
    p.add_argument("--unroll1", type=int, default=2)
    p.add_argument("--unroll2", type=int, default=2)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--valid_step", type=int, default=50)
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="classification npz (x_train/y_train); synthetic if unset")
    args = p.parse_args()
    engine = build_engine(args)
    engine.run()
    mask = jax.nn.sigmoid(engine.states["outer"]["params"]["mask"])
    print("saliency mask mean:", float(mask.mean()))
