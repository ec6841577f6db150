"""DARTS neural architecture search (bilevel, roll-back/warm-start).

Capability port of reference ``examples/neural_architecture_search/
train_search.py``: arch problem (alphas) <- classifier problem (supernet),
darts solver, ``roll_back=True``, genotype derived at each validation.
TPU-first: the supernet takes alphas as a function argument (see
betty_tpu/models/darts.py) and the whole search step runs as one or two XLA
programs. Synthetic CIFAR-shaped data by default (no dataset egress here);
``--data-dir`` ingests real CIFAR-10 (pickle layout or npz) with the
reference's half/half train/arch-valid split of the training set
(reference train_search.py data section), test-set accuracy at each
validation, and best-genotype checkpointing.
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
from betty_tpu.models.darts import (DARTSNetwork, derive_genotype,
                                    genotype_to_json, init_alphas)
from betty_tpu.module import from_flax, from_fn

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "learning_to_reweight"))
from main import BatchLoader, make_synthetic_cifar  # noqa: E402


class Arch(ImplicitProblem):
    def training_step(self, batch):
        inputs, labels = batch
        logits = self.classifier_fwd(inputs)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        return loss

    def classifier_fwd(self, inputs):
        # supernet forward with *this problem's* (traced) alphas
        return self.classifier.module(inputs, self.params)


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        inputs, labels = batch
        logits = self.module(inputs, self.arch.params)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        acc = (logits.argmax(axis=1) == labels).mean() * 100
        return {"loss": loss, "acc": acc}


class SearchEngine(Engine):
    test_data = None  # (x, y) when a real dataset is loaded
    eval_batch = 256

    def validation(self):
        genotype = derive_genotype(self.arch.params)
        self.logger.info(f"genotype = {genotype}")
        out = {}
        if self.test_data is not None:
            x, y = self.test_data
            bs = min(self.eval_batch, len(y))
            correct = n = 0
            for i in range(0, len(y) - bs + 1, bs):
                logits = self.classifier(jnp.asarray(x[i : i + bs]),
                                         self.arch.params)
                correct += int(
                    (np.asarray(logits).argmax(1) == y[i : i + bs]).sum()
                )
                n += bs
            out["test_acc"] = 100.0 * correct / max(n, 1)
        inputs, labels = self.arch.cur_batch
        ctx = {n: {"params": s["params"], "extra": s["extra"]}
               for n, s in self.states.items()}
        loss, _, _ = self.arch.eval_loss(ctx, (inputs, labels))
        out["loss"] = loss
        return out


def build_engine(args):
    test_data = None
    if getattr(args, "data_dir", None):
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from vision_data import load_classification

        x_all, y_all, x_test, y_test = load_classification(args.data_dir)
        # reference split: first half of train trains weights, second half
        # trains the architecture (train_search.py)
        half = len(y_all) // 2
        x_train, y_train = x_all[:half], y_all[:half]
        x_val, y_val = x_all[half:], y_all[half:]
        test_data = (x_test, y_test)
    else:
        x_train, y_train = make_synthetic_cifar(args.train_size, seed=0)
        x_val, y_val = make_synthetic_cifar(args.train_size, seed=1)

    net = DARTSNetwork(channels=args.channels, layers=args.layers,
                       num_classes=10)
    sample = jnp.zeros((args.batch_size, 32, 32, 3), jnp.float32)
    supernet = from_flax(net, sample, init_alphas(),
                         rng=jax.random.PRNGKey(0), train_kwarg="train")

    arch = Arch(
        name="arch",
        module=from_fn(lambda p: p, init_alphas(jax.random.PRNGKey(1))),
        optimizer=optim.adam(lr=args.arch_lr, betas=(0.5, 0.999),
                             weight_decay=1e-3),
        train_data_loader=BatchLoader(x_val, y_val, args.batch_size, seed=1),
        config=Config(type="darts", unroll_steps=1, log_step=args.log_step),
    )
    classifier = Classifier(
        name="classifier",
        module=supernet,
        optimizer=optim.sgd(
            lr=args.lr, momentum=0.9, weight_decay=3e-4,
            schedule=optim.cosine_lr(args.lr, args.train_iters, 1e-3),
        ),
        train_data_loader=BatchLoader(x_train, y_train, args.batch_size,
                                      seed=0),
        config=Config(type="darts", unroll_steps=args.unroll_steps,
                      log_step=args.log_step),
    )
    engine = SearchEngine(
        config=EngineConfig(train_iters=args.train_iters,
                            valid_step=args.valid_step, roll_back=True),
        problems=[arch, classifier],
        dependencies={"u2l": {arch: [classifier]},
                      "l2u": {classifier: [arch]}},
    )
    engine.test_data = test_data
    return engine


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--channels", type=int, default=16)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.025)
    p.add_argument("--arch_lr", type=float, default=3e-4)
    p.add_argument("--unroll_steps", type=int, default=1)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--valid_step", type=int, default=50)
    p.add_argument("--train_size", type=int, default=1024)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="CIFAR-10 pickle dir or npz; synthetic if unset")
    p.add_argument("--genotype-out", type=str, default=None,
                   help="write the final genotype as JSON (consumed by "
                        "train.py, the evaluation phase)")
    return p.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    engine = build_engine(args)
    engine.run()
    genotype = derive_genotype(engine.arch.params)
    print("final genotype:", genotype)
    if args.genotype_out:
        Path(args.genotype_out).write_text(genotype_to_json(genotype))
        print("wrote", args.genotype_out)
