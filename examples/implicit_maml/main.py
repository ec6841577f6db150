"""Implicit MAML (iMAML) few-shot classification with an Env task sampler.

Capability port of reference ``examples/implicit_maml/main.py``: meta-init
problem <- task-adaptation problem with proximal regularization; tasks
sampled by a ``MAMLEnv`` whose ``step()`` the custom engine calls at each
inner-loop start (reference main.py:140-160); inner warm-starts from the
meta weights (``on_inner_loop_start``), cg(3, alpha=1.0) implicit
differentiation, ``unroll_steps=inner_steps``,
``gradient_accumulation=meta_batch_size``. Synthetic Omniglot-shaped tasks
(class-prototype images + noise); swap in real Omniglot for paper numbers.
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
from betty_tpu.envs import Env
from betty_tpu.models import OmniglotCNN
from betty_tpu.module import from_flax


class MAMLEnv(Env):
    """Samples one few-shot task per inner loop (reference MAMLEnv)."""

    def __init__(self, ways=5, shots=1, query_shots=5, image=28, seed=0):
        super().__init__()
        self.ways, self.shots, self.query_shots = ways, shots, query_shots
        self.image = image
        self.rng = np.random.RandomState(seed)
        self.support = None
        self.query = None
        self.step()

    def step(self):
        protos = self.rng.randn(self.ways, self.image, self.image, 1) * 1.0

        def sample(n_per_class):
            xs, ys = [], []
            for c in range(self.ways):
                noise = self.rng.randn(n_per_class, self.image, self.image, 1)
                xs.append(protos[c][None] + 0.5 * noise)
                ys.append(np.full(n_per_class, c))
            x = np.concatenate(xs).astype(np.float32)
            y = np.concatenate(ys).astype(np.int32)
            order = self.rng.permutation(len(x))
            return x[order], y[order]

        self.support = sample(self.shots)
        self.query = sample(self.query_shots)


def ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


class Meta(ImplicitProblem):
    def training_step(self, batch):
        x, y = batch
        logits = self.inner(x)
        loss = ce(logits, y)
        acc = (logits.argmax(axis=1) == y).mean() * 100
        return {"loss": loss, "acc": acc}

    def get_batch(self):
        return self._convert_batch(self.env.query)


class Inner(ImplicitProblem):
    def training_step(self, batch):
        x, y = batch
        logits = self.module(x)
        loss = ce(logits, y)
        # proximal regularization to the meta weights (iMAML)
        prox = sum(
            jnp.sum((a - b) ** 2)
            for a, b in zip(
                jax.tree_util.tree_leaves(self.params),
                jax.tree_util.tree_leaves(self.meta.params),
            )
        )
        return loss + 0.5 * self.cfg["reg"] * prox

    def get_batch(self):
        return self._convert_batch(self.env.support)

    def on_inner_loop_start(self):
        # warm start from the meta initialization (reference main.py:136-137)
        self.set_params(self.meta.params)


class MAMLEngine(Engine):
    """Samples a fresh task at each inner-loop start
    (reference MAMLEngine.train_step, main.py:155-160)."""

    def train_step(self):
        if self.inner._inner_loop_start:
            self.env.step()
        super().train_step()


def build_engine(args):
    env = MAMLEnv(ways=args.ways, shots=args.shots, seed=args.seed)
    sample = jnp.zeros(
        (args.ways * args.shots, 28, 28, 1), jnp.float32
    )
    net = lambda seed: from_flax(
        OmniglotCNN(num_classes=args.ways), sample,
        rng=jax.random.PRNGKey(seed), train_kwarg="train",
    )
    meta = Meta(
        name="meta", module=net(0),
        optimizer=optim.adam(lr=args.meta_lr),
        config=Config(
            type="cg", cg_iterations=3, cg_alpha=1.0,
            unroll_steps=1,
            gradient_accumulation=args.meta_batch_size,
            log_step=args.log_step,
        ),
    )
    inner = Inner(
        name="inner", module=net(1),
        optimizer=optim.sgd(lr=args.inner_lr),
        config=Config(unroll_steps=args.inner_steps),
        extra_config={"reg": args.reg},
    )
    return MAMLEngine(
        config=EngineConfig(train_iters=args.train_iters),
        problems=[meta, inner],
        dependencies={"u2l": {meta: [inner]}, "l2u": {inner: [meta]}},
        env=env,
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--ways", type=int, default=5)
    p.add_argument("--shots", type=int, default=1)
    p.add_argument("--inner_steps", type=int, default=5)
    p.add_argument("--meta_batch_size", type=int, default=4)
    p.add_argument("--inner_lr", type=float, default=0.1)
    p.add_argument("--meta_lr", type=float, default=1e-3)
    p.add_argument("--reg", type=float, default=2.0)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_step", type=int, default=-1)
    args = p.parse_args()
    engine = build_engine(args)
    engine.run()
