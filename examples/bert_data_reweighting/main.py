"""BERT/RoBERTa-style data reweighting with SAMA (the north-star workload).

Capability port of reference ``examples/bert_data_reweighting/main.py``
(bilevel: MLP reweighter <- transformer classifier on imbalanced SST-2;
``--hypergradient sama``, fp16, unroll=5, strategies default/distributed/
zero). TPU-native: bf16 precision, ``strategy`` selects a mesh sharding
layout (dp / zero / fsdp) — SAMA's cross-replica reductions become XLA
collectives over ICI automatically. Synthetic token data by default; plug a
real SST-2 loader for dataset numbers. Scale the model with
``--model large`` (≈355M params, the v5e-8 target).
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
from betty_tpu.models import MetaWeightNet
from betty_tpu.models.transformer import (
    TransformerClassifier,
    roberta_large_config,
)
from betty_tpu.module import from_flax


def make_synthetic_sst2(n, seq_len, vocab, seed=0, imbalance=10):
    """Imbalanced binary classification over token sequences."""
    rng = np.random.RandomState(seed)
    n_pos = n // (imbalance + 1)
    labels = np.concatenate(
        [np.ones(n_pos), np.zeros(n - n_pos)]
    ).astype(np.int32)
    rng.shuffle(labels)
    ids = rng.randint(2, vocab, size=(n, seq_len)).astype(np.int32)
    # implant a weak label signal so learning is possible
    ids[:, 0] = np.where(labels == 1, 5, 7)
    return ids, labels


from betty_tpu.data import ArrayLoader


class TokenLoader(ArrayLoader):
    def __init__(self, x, y, batch_size, seed=0, device=False):
        super().__init__(x, y, batch_size=batch_size, seed=seed,
                         device=device)


class Reweight(ImplicitProblem):
    def training_step(self, batch):
        input_ids, labels = batch
        logits = self.classifier(input_ids)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        acc = (logits.argmax(axis=1) == labels).mean() * 100
        return {"loss": loss, "acc": acc}


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        input_ids, labels = batch
        logits = self.module(input_ids)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        weight = self.reweight(jax.lax.stop_gradient(ce))
        return jnp.sum(weight * ce) / jnp.maximum(jnp.sum(weight), 1e-8)


def build_engine(args):
    vocab = 1000 if args.model == "small" else 50265
    x_train, y_train = make_synthetic_sst2(
        args.train_size, args.seq_len, vocab, seed=0,
        imbalance=args.imbalance,
    )
    x_meta, y_meta = make_synthetic_sst2(
        args.meta_size, args.seq_len, vocab, seed=1, imbalance=1
    )

    if args.model == "large":
        model = roberta_large_config(max_len=args.seq_len)
    else:
        model = TransformerClassifier(
            vocab_size=vocab, max_len=args.seq_len, dim=args.dim,
            depth=args.depth, heads=args.heads,
        )
    sample = jnp.zeros((args.batch_size, args.seq_len), jnp.int32)
    classifier_mod = from_flax(model, sample, rng=jax.random.PRNGKey(0),
                               train_kwarg="train")
    mwn = from_flax(MetaWeightNet(), jnp.zeros((args.batch_size,)),
                    rng=jax.random.PRNGKey(1), train_kwarg="train")

    reweight = Reweight(
        name="reweight",
        module=mwn,
        optimizer=optim.adam(lr=args.meta_lr),
        train_data_loader=TokenLoader(x_meta, y_meta, args.batch_size,
                                      seed=1, device=args.device_data),
        config=Config(type=args.hypergradient, precision=args.precision,
                      log_step=args.log_step),
    )
    classifier = Classifier(
        name="classifier",
        module=classifier_mod,
        optimizer=optim.adamw(lr=args.lr, weight_decay=0.01),
        train_data_loader=TokenLoader(x_train, y_train, args.batch_size,
                                      seed=0, device=args.device_data),
        config=Config(type=args.hypergradient,
                      unroll_steps=args.unroll_steps,
                      precision=args.precision, log_step=args.log_step),
    )
    return Engine(
        config=EngineConfig(
            train_iters=args.train_iters, valid_step=args.valid_step,
            strategy=args.strategy, compile_blocks=args.compile_blocks,
        ),
        problems=[reweight, classifier],
        dependencies={"u2l": {reweight: [classifier]},
                      "l2u": {classifier: [reweight]}},
    )


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="small", choices=["small", "large"])
    p.add_argument("--hypergradient", default="sama",
                   choices=["sama", "darts", "cg", "neumann"])
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("--strategy", default="default",
                   choices=["default", "dp", "distributed", "zero", "fsdp"])
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seq_len", type=int, default=128)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--meta_lr", type=float, default=1e-4)
    p.add_argument("--unroll_steps", type=int, default=5)
    p.add_argument("--imbalance", type=int, default=10)
    p.add_argument("--train_size", type=int, default=2048)
    p.add_argument("--meta_size", type=int, default=512)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--valid_step", type=int, default=1000)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--compile_blocks", action="store_true")
    p.add_argument("--device_data", action="store_true")
    return p.parse_args(argv)


if __name__ == "__main__":
    engine = build_engine(parse_args())
    engine.run()
