"""3-level NAS-augmented sequence modeling (IUC program shape).

Capability port of reference
``examples/nas_augmented_image_captioning_3_level/train_search_IUC.py``:
3 problems — ``outer`` (architecture) <- ``inner2`` (pseudo-data learner) <-
``inner1`` (sequence model) with graph
``l2u={inner1:[inner2, outer], inner2:[outer]}``,
``u2l={outer:[inner2, inner1]}`` and a first-order outer
(reference :472-488). The reference trains a COCO captioner; here the same
program shape runs on a synthetic token-sequence task (this environment has
no dataset egress) with a small transformer as the captioner stand-in.
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
from betty_tpu.models.transformer import TransformerClassifier
from betty_tpu.module import from_flax, from_fn


def make_seq_data(n, seq_len, vocab, classes, seed):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, classes, n).astype(np.int32)
    ids = rng.randint(2, vocab, size=(n, seq_len)).astype(np.int32)
    ids[:, 0] = 5 + y  # weak signal token
    return ids, y


def ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


class Outer(ImplicitProblem):
    """Level 3: architecture mixing weights, first-order (reference :472-474)."""

    def training_step(self, batch):
        ids, y = batch
        logits = self.inner1.mixed_forward(ids)
        return ce(logits, y)


class Inner2(ImplicitProblem):
    """Level 2: pseudo-data learner — per-example soft labels for augmented
    sequences that the captioner also trains on."""

    def training_step(self, batch):
        ids, y = batch
        logits = self.inner1.mixed_forward(ids)
        pseudo = jax.nn.softmax(self.module()[: ids.shape[0]])
        loss = -jnp.mean(
            jnp.sum(pseudo * jax.nn.log_softmax(logits), axis=1)
        )
        return loss + 0.1 * ce(logits, y)


class Inner1(ImplicitProblem):
    """Level 1: the sequence model, trained on real + pseudo-labeled data."""

    def mixed_forward(self, ids):
        # architecture weights mix two heads (a tiny supernet stand-in)
        w = jax.nn.softmax(self.outer())
        logits = self.module(ids)
        return w[0] * logits + w[1] * jax.nn.log_softmax(logits)

    def training_step(self, batch):
        ids, y = batch
        logits = self.mixed_forward(ids)
        real_loss = ce(logits, y)
        pseudo = jax.nn.softmax(self.inner2.module()[: ids.shape[0]])
        pseudo_loss = -jnp.mean(
            jnp.sum(pseudo * jax.nn.log_softmax(logits), axis=1)
        )
        return real_loss + 0.5 * pseudo_loss


class IUCEngine(Engine):
    """Held-out captioner accuracy per validation (the reference evaluates
    BLEU/CIDEr per epoch, eval_cider.py; the capability port's proxy task
    scores sequence-classification accuracy)."""

    test_data = None

    def validation(self):
        if self.test_data is None:
            return {}
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from vision_data import problem_accuracy

        x, y = self.test_data
        acc = problem_accuracy(lambda xb: self.inner1(xb), x, y, batch=64)
        return {"caption_acc": acc}


def build_engine(args):
    if getattr(args, "data_dir", None):
        # token npz: x (N, seq) int ids + y labels, split into thirds for
        # the 3 levels (real COCO runs tokenize captions offline)
        d = np.load(args.data_dir)
        x = np.asarray(d["x"], np.int32)
        y = np.asarray(d["y"], np.int32)
        third = len(y) // 3
        x_tr, y_tr = x[:third], y[:third]
        x_v1, y_v1 = x[third : 2 * third], y[third : 2 * third]
        x_v2, y_v2 = x[2 * third :], y[2 * third :]
        args.seq_len = x.shape[1]
        args.vocab = int(x.max()) + 1
        args.classes = int(y.max()) + 1
    else:
        x_tr, y_tr = make_seq_data(args.n, args.seq_len, args.vocab,
                                   args.classes, 0)
        x_v1, y_v1 = make_seq_data(args.n, args.seq_len, args.vocab,
                                   args.classes, 1)
        x_v2, y_v2 = make_seq_data(args.n, args.seq_len, args.vocab,
                                   args.classes, 2)

    # held-out eval split: last 20% of the outer split stays out of
    # every training loader
    holdout = max(len(y_v2) // 5, 1)
    x_test, y_test = x_v2[-holdout:], y_v2[-holdout:]
    x_v2, y_v2 = x_v2[:-holdout], y_v2[:-holdout]

    def loader(x, y):
        return [(x[i : i + args.batch], y[i : i + args.batch])
                for i in range(0, len(x) - args.batch + 1, args.batch)]

    model = TransformerClassifier(
        vocab_size=args.vocab, max_len=args.seq_len, dim=args.dim,
        depth=args.depth, heads=args.heads, num_classes=args.classes,
    )
    captioner = from_flax(
        model, jnp.zeros((args.batch, args.seq_len), jnp.int32),
        rng=jax.random.PRNGKey(0), train_kwarg="train",
    )

    outer = Outer(
        name="outer",
        module=from_fn(lambda p: p["w"], {"w": jnp.zeros(2)}),
        optimizer=optim.adam(lr=1e-3),
        train_data_loader=loader(x_v2, y_v2),
        config=Config(type="darts", first_order=True, log_step=args.log_step),
    )
    inner2 = Inner2(
        name="inner2",
        module=from_fn(lambda p: p["labels"],
                       {"labels": jnp.zeros((args.batch, args.classes))}),
        optimizer=optim.adam(lr=1e-3),
        train_data_loader=loader(x_v1, y_v1),
        config=Config(type="darts", unroll_steps=args.unroll2),
    )
    inner1 = Inner1(
        name="inner1",
        module=captioner,
        optimizer=optim.adamw(lr=1e-4),
        train_data_loader=loader(x_tr, y_tr),
        config=Config(type="darts", unroll_steps=args.unroll1),
    )
    engine = IUCEngine(
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
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq_len", type=int, default=16)
    p.add_argument("--vocab", type=int, default=256)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--unroll1", type=int, default=2)
    p.add_argument("--unroll2", type=int, default=2)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--valid_step", type=int, default=50)
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="token npz (x: (N,seq) ids, y: labels); synthetic if unset")
    args = p.parse_args()
    engine = build_engine(args)
    engine.run()
