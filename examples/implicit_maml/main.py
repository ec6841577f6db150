"""Implicit MAML (iMAML) few-shot classification with an Env task sampler.

Capability port of reference ``examples/implicit_maml/main.py``: meta-init
problem <- task-adaptation problem with proximal regularization; tasks
sampled by a ``MAMLEnv`` whose ``step()`` the custom engine calls at each
inner-loop start (reference main.py:140-160); inner warm-starts from the
meta weights (``on_inner_loop_start``), cg(3, alpha=1.0) implicit
differentiation, ``unroll_steps=inner_steps``,
``gradient_accumulation=meta_batch_size``. Synthetic Omniglot-shaped tasks
(class-prototype images + noise) by default; ``--data-dir`` ingests a real
Omniglot npz (``images (N,28,28[,1])``, ``labels`` character ids) with a
class-disjoint meta-train/meta-test split, and ``--eval_tasks`` runs the
reference's validation protocol — fresh fine-tune loops on held-out tasks
reporting query accuracy (reference main.py:162-195).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.envs import Env
from betty_tpu.models import OmniglotCNN
from betty_tpu.module import from_flax


class MAMLEnv(Env):
    """Samples one few-shot task per inner loop (reference MAMLEnv).

    Synthetic mode draws class prototypes + noise; dataset mode samples
    ``ways`` classes from an (images, labels) pool and splits each class's
    examples into support/query."""

    def __init__(self, ways=5, shots=1, query_shots=5, image=28, seed=0,
                 pool=None):
        super().__init__()
        self.ways, self.shots, self.query_shots = ways, shots, query_shots
        self.image = image
        self.rng = np.random.RandomState(seed)
        self.pool = pool  # (images, labels, class_ids) or None
        self.support = None
        self.query = None
        self.step()

    def step(self):
        if self.pool is not None:
            self.support, self.query = sample_task_from_pool(
                self.pool, self.ways, self.shots, self.query_shots, self.rng
            )
            return
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


def sample_task_from_pool(pool, ways, shots, query_shots, rng):
    """One N-way K-shot task from a class-indexed example pool."""
    images, labels, class_ids = pool
    chosen = rng.choice(class_ids, size=ways, replace=False)
    sx, sy, qx, qy = [], [], [], []
    for new_label, c in enumerate(chosen):
        idx = np.flatnonzero(labels == c)
        idx = rng.permutation(idx)[: shots + query_shots]
        sx.append(images[idx[:shots]])
        sy.append(np.full(shots, new_label))
        qx.append(images[idx[shots:]])
        qy.append(np.full(len(idx) - shots, new_label))
    def cat(xs, ys):
        x = np.concatenate(xs).astype(np.float32)
        y = np.concatenate(ys).astype(np.int32)
        order = rng.permutation(len(x))
        return x[order], y[order]
    return cat(sx, sy), cat(qx, qy)


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
    (reference MAMLEngine.train_step, main.py:155-160); validation runs
    fresh fine-tune loops on held-out tasks (reference main.py:162-195)."""

    test_pool = None  # (images, labels, class_ids) of meta-test classes
    eval_tasks = 20
    maml_args = None

    def train_step(self):
        if self.inner._inner_loop_start:
            self.env.step()
        super().train_step()

    def validation(self):
        if self.test_pool is None:
            return {}
        a = self.maml_args
        rng = np.random.RandomState(1234)
        accs = []
        extra = self.states["inner"]["extra"]  # batch_stats etc.
        for _ in range(self.eval_tasks):
            (sx, sy), (qx, qy) = sample_task_from_pool(
                self.test_pool, a.ways, a.shots, 5, rng
            )
            params = self.meta.params  # fresh fine-tune from meta init
            sx_d, sy_d = jnp.asarray(sx), jnp.asarray(sy)

            def loss_fn(p):
                logits = self.inner.module_fn.apply(
                    {"params": p, **extra}, sx_d, train=False
                )
                return ce(logits, sy_d)

            for _ in range(a.inner_steps):
                g = jax.grad(loss_fn)(params)
                params = jax.tree_util.tree_map(
                    lambda p, gi: p - a.inner_lr * gi, params, g
                )
            logits = self.inner.module_fn.apply(
                {"params": params, **extra}, jnp.asarray(qx), train=False
            )
            accs.append(float((np.asarray(logits).argmax(1) == qy).mean()))
        return {"meta_test_acc": 100.0 * float(np.mean(accs))}


def split_omniglot_pools(data_dir, holdout_frac=0.2, seed=0):
    """Class-disjoint meta-train / meta-test pools from an Omniglot npz."""
    from vision_data import load_omniglot

    images, labels = load_omniglot(data_dir)
    classes = np.unique(labels)
    rng = np.random.RandomState(seed)
    rng.shuffle(classes)
    n_test = max(1, int(len(classes) * holdout_frac))
    test_cls, train_cls = classes[:n_test], classes[n_test:]
    return (images, labels, train_cls), (images, labels, test_cls)


def build_engine(args):
    train_pool = test_pool = None
    if getattr(args, "data_dir", None):
        train_pool, test_pool = split_omniglot_pools(args.data_dir)
    env = MAMLEnv(ways=args.ways, shots=args.shots, seed=args.seed,
                  pool=train_pool)
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
    engine = MAMLEngine(
        config=EngineConfig(train_iters=args.train_iters,
                            valid_step=getattr(args, "valid_step", 1000)),
        problems=[meta, inner],
        dependencies={"u2l": {meta: [inner]}, "l2u": {inner: [meta]}},
        env=env,
    )
    engine.test_pool = test_pool
    engine.eval_tasks = getattr(args, "eval_tasks", 20)
    engine.maml_args = args
    return engine


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ways", type=int, default=5)
    p.add_argument("--shots", type=int, default=1)
    p.add_argument("--inner_steps", type=int, default=5)
    p.add_argument("--meta_batch_size", type=int, default=4)
    p.add_argument("--inner_lr", type=float, default=0.1)
    p.add_argument("--meta_lr", type=float, default=1e-3)
    p.add_argument("--reg", type=float, default=2.0)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--valid_step", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="Omniglot npz (images, labels); synthetic if unset")
    p.add_argument("--eval_tasks", type=int, default=20)
    return p.parse_args(argv)


if __name__ == "__main__":
    engine = build_engine(parse_args())
    engine.run()
