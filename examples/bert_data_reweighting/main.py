"""BERT/RoBERTa-style data reweighting with SAMA (the north-star workload).

Capability port of reference ``examples/bert_data_reweighting/main.py``
(bilevel: MLP reweighter <- transformer classifier on imbalanced SST-2;
``--hypergradient sama``, fp16, unroll=5, strategies default/distributed/
zero). TPU-native: bf16 precision, ``strategy`` selects a mesh sharding
layout (dp / zero / fsdp) — SAMA's cross-replica reductions become XLA
collectives over ICI automatically. Scale the model with
``--model large`` (≈355M params, the v5e-8 target).

Data: synthetic token data by default. ``--data-dir`` ingests real SST-2:
a GLUE-style TSV directory (``train.tsv``/``dev.tsv``, columns
label<TAB>sentence — the reference's layout, ``main.py:53-66``) tokenized
with a local HuggingFace tokenizer when one is available at
``<data-dir>/tokenizer`` (no download egress here), else a hashed-vocab
whitespace tokenizer; or an ``.npz`` with pre-tokenized ``x_train/y_train/
x_dev/y_dev`` id arrays. Long-tail imbalance follows the reference's
``split_dataset`` (``utils.py:38-67``). ``validation()`` reports dev
accuracy and checkpoints on improvement.
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
from betty_tpu.models import MetaWeightNet
from betty_tpu.models.transformer import (
    TransformerClassifier,
    roberta_large_config,
)
from betty_tpu.module import from_flax, from_hf_flax


def make_synthetic_sst2(n, seq_len, vocab, seed=0, imbalance=10, signal=1.0):
    """Imbalanced binary classification over token sequences.

    ``signal=1.0`` (default): a deterministic class token at position 0 —
    trivially separable, the smoke-test regime.

    ``signal < 1``: DISTRIBUTED evidence, the real-SST-2 shape — every
    token is drawn from the label's half of the vocabulary with
    probability ``signal`` (from the other half otherwise), so each
    example carries a sum of weak sentiment cues and the class posterior
    varies smoothly across examples. Under a strong class prior the
    uniform-loss decision threshold cuts deep into the minority's margin
    band (e.g. signal .62 / imbalance 10: balanced Bayes accuracy ~.84
    but uniform-loss minority recall ~.41); balanced reweighting shifts
    the threshold back — the failure/recovery mode the reference's
    imbalanced-SST-2 study targets (reference
    examples/bert_data_reweighting/README.md).
    """
    rng = np.random.RandomState(seed)
    n_pos = n // (imbalance + 1)
    labels = np.concatenate(
        [np.ones(n_pos), np.zeros(n - n_pos)]
    ).astype(np.int32)
    rng.shuffle(labels)
    if signal >= 1.0:
        ids = rng.randint(2, vocab, size=(n, seq_len)).astype(np.int32)
        ids[:, 0] = np.where(labels == 1, 5, 7)
        return ids, labels
    half = (vocab - 2) // 2
    own_half = rng.rand(n, seq_len) < signal  # token from the label's half?
    pos_half = own_half == (labels == 1)[:, None]  # -> "positive" vocab half
    offs = rng.randint(0, half, size=(n, seq_len))
    ids = np.where(pos_half, 2 + offs, 2 + half + offs).astype(np.int32)
    return ids, labels


from betty_tpu.data import ArrayLoader


def hashed_tokenize(sentences, vocab, seq_len):
    """Deterministic no-download tokenizer: whitespace split, stable hash
    into [2, vocab) (0=pad, 1=cls). Makes real text usable without a
    pretrained vocab; swap in a local HF tokenizer for published numbers."""
    import zlib

    ids = np.zeros((len(sentences), seq_len), np.int32)
    ids[:, 0] = 1
    for i, s in enumerate(sentences):
        toks = str(s).lower().split()[: seq_len - 1]
        for j, t in enumerate(toks):
            ids[i, j + 1] = 2 + (zlib.crc32(t.encode()) % (vocab - 2))
    return ids


def load_sst2(data_dir, vocab, seq_len):
    """(x_train, y_train, x_dev, y_dev) token-id arrays from --data-dir."""
    import os

    if os.path.isfile(data_dir) and data_dir.endswith(".npz"):
        d = np.load(data_dir)
        return (d["x_train"].astype(np.int32), d["y_train"].astype(np.int32),
                d["x_dev"].astype(np.int32), d["y_dev"].astype(np.int32))

    def read_tsv(name):
        labels, sents = [], []
        with open(os.path.join(data_dir, name)) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t", 1)
                if len(parts) != 2:
                    continue  # malformed row
                if parts[0].strip().isdigit():          # label<TAB>sentence
                    labels.append(int(parts[0]))
                    sents.append(parts[1])
                elif parts[1].strip().isdigit():        # sentence<TAB>label
                    labels.append(int(parts[1]))        # (GLUE column order)
                    sents.append(parts[0])
        if not labels:
            raise ValueError(
                f"{name}: no parseable rows — expected TSV with a numeric "
                "label column in either position (header rows are skipped)"
            )
        return sents, np.asarray(labels, np.int32)

    tok_path = os.path.join(data_dir, "tokenizer")
    tokenize = None
    if os.path.isdir(tok_path):
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(tok_path, local_files_only=True)

            def tokenize(sents):
                out = tok(sents, max_length=seq_len, padding="max_length",
                          truncation=True)
                return np.asarray(out["input_ids"], np.int32)
        except Exception:
            tokenize = None
    if tokenize is None:
        def tokenize(sents):
            return hashed_tokenize(sents, vocab, seq_len)

    s_tr, y_tr = read_tsv("train.tsv")
    s_dev, y_dev = read_tsv("dev.tsv")
    return tokenize(s_tr), y_tr, tokenize(s_dev), y_dev


def split_imbalanced(x, y, imbalance_factor, num_meta_total=200, seed=1):
    """Balanced meta split + long-tail train subsampling (reference
    ``utils.py:38-67`` semantics, 2 classes)."""
    rng = np.random.RandomState(seed)
    num_classes = 2
    num_meta = num_meta_total // num_classes
    sample_num = (len(y) - num_meta_total) // num_classes
    counts = [
        int(sample_num / imbalance_factor ** (c / (num_classes - 1)))
        for c in range(num_classes)
    ]
    idx_meta, idx_train = [], []
    for c in range(num_classes):
        idx_c = np.flatnonzero(y == c)
        rng.shuffle(idx_c)
        idx_meta.extend(idx_c[:num_meta])
        idx_train.extend(idx_c[num_meta:][: counts[c]])
    idx_meta, idx_train = np.asarray(idx_meta), np.asarray(idx_train)
    rng.shuffle(idx_train)
    return x[idx_train], y[idx_train], x[idx_meta], y[idx_meta]


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


class SST2Engine(Engine):
    """Dev-accuracy validation + best-checkpoint saving (reference
    examples/bert_data_reweighting/main.py:160-178)."""

    dev_data = None
    checkpoint_dir = None
    eval_batch = 256
    best_acc = -1.0

    def validation(self):
        if self.dev_data is None:
            return {}
        from vision_data import problem_accuracy

        x, y = self.dev_data
        acc = problem_accuracy(self.classifier, x, y, batch=self.eval_batch)
        if acc > self.best_acc:
            self.best_acc = acc
            if self.checkpoint_dir:
                self.save_checkpoint(self.checkpoint_dir)
        return {"acc": acc, "best_acc": self.best_acc}


def build_engine(args):
    vocab = 1000 if args.model == "small" else 50265
    dev_data = None
    if args.data_dir:
        x_all, y_all, x_dev, y_dev = load_sst2(
            args.data_dir, vocab, args.seq_len
        )
        x_train, y_train, x_meta, y_meta = split_imbalanced(
            x_all, y_all, args.imbalance, num_meta_total=args.num_meta,
        )
        dev_data = (x_dev, y_dev)
    else:
        signal = getattr(args, "signal", 1.0)
        x_train, y_train = make_synthetic_sst2(
            args.train_size, args.seq_len, vocab, seed=0,
            imbalance=args.imbalance, signal=signal,
        )
        x_meta, y_meta = make_synthetic_sst2(
            args.meta_size, args.seq_len, vocab, seed=1, imbalance=1,
            signal=signal,
        )

    if args.flash and args.hypergradient in ("cg", "neumann"):
        raise ValueError(
            "--flash uses a custom-VJP Pallas kernel (reverse-mode only); "
            "CG/Neumann HVPs differentiate through the gradient and need "
            "the plain einsum attention — drop --flash or use darts/sama"
        )
    if args.hf_model:
        if args.flash:
            raise ValueError(
                "--flash only routes through betty_tpu's TransformerClassifier; "
                "a --hf_model checkpoint keeps its own (einsum) attention — "
                "drop --flash or use --model small/large"
            )
        # a local HuggingFace checkpoint directory (no download egress):
        # the reference's actual model family (roberta-large fine-tune)
        from transformers import FlaxAutoModelForSequenceClassification

        hf = FlaxAutoModelForSequenceClassification.from_pretrained(
            args.hf_model, local_files_only=True
        )
        classifier_mod = from_hf_flax(hf)
    else:
        policy = None if args.remat_policy == "full" else args.remat_policy
        if args.model == "large":
            model = roberta_large_config(max_len=args.seq_len,
                                         use_flash=args.flash,
                                         remat=args.remat,
                                         dropout=args.dropout,
                                         remat_policy=policy)
        else:
            model = TransformerClassifier(
                vocab_size=vocab, max_len=args.seq_len, dim=args.dim,
                depth=args.depth, heads=args.heads, use_flash=args.flash,
                remat=args.remat, remat_policy=policy,
                dropout=args.dropout,
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
                      solver_precision=args.solver_precision,
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
                      precision=args.precision,
                      solver_precision=args.solver_precision,
                      log_step=args.log_step),
    )
    engine = SST2Engine(
        config=EngineConfig(
            train_iters=args.train_iters, valid_step=args.valid_step,
            strategy=args.strategy, compile_blocks=args.compile_blocks,
            donate_state=args.donate, rng_impl=args.rng_impl,
            mesh_shape=tuple(
                (n, int(s)) for n, s in
                (ax.split(":") for ax in args.mesh.split(","))
            ) if args.mesh else None,
        ),
        problems=[reweight, classifier],
        dependencies={"u2l": {reweight: [classifier]},
                      "l2u": {classifier: [reweight]}},
    )
    engine.dev_data = dev_data
    engine.checkpoint_dir = args.checkpoint_dir
    return engine


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="small", choices=["small", "large"])
    p.add_argument("--hf_model", type=str, default=None,
                   help="local HuggingFace Flax checkpoint dir (e.g. a saved "
                        "roberta); overrides --model")
    p.add_argument("--hypergradient", default="sama",
                   choices=["sama", "darts", "cg", "neumann"])
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("--solver_precision", default="fp32",
                   choices=["fp32", "bf16"],
                   help="Precision of the SAMA/darts hypergradient pipeline "
                        "(perturbed forwards + meta grad). fp32 (default) "
                        "reproduces the all-fp32 hypergradient bit-exactly "
                        "(tests/test_bf16.py); bf16 trades ~1-4%% "
                        "hypergradient error for throughput.")
    p.add_argument("--strategy", default="default",
                   choices=["default", "dp", "distributed", "zero", "fsdp",
                            "tp"])
    p.add_argument("--mesh", default=None,
                   help="mesh axes as 'name:size,name:size', e.g. "
                        "'dp:2,mdl:4' (default: all devices on dp)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seq_len", type=int, default=128)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--meta_lr", type=float, default=1e-4)
    p.add_argument("--unroll_steps", type=int, default=5)
    p.add_argument("--imbalance", type=int, default=10)
    p.add_argument("--signal", type=float, default=1.0,
                   help="probability the synthetic signal token matches the "
                        "label (<1 = overlapping classes, the regime where "
                        "imbalance suppresses minority recall)")
    p.add_argument("--train_size", type=int, default=2048)
    p.add_argument("--meta_size", type=int, default=512)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--valid_step", type=int, default=1000)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--flash", action="store_true",
                   help="blockwise Pallas attention (reverse-mode solvers "
                        "only: darts/sama)")
    p.add_argument("--donate", action="store_true",
                   help="donate state buffers to the jitted update "
                        "(in-place on device: halves state HBM — required "
                        "headroom for --model large on a 16GB chip)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder blocks in the backward "
                        "(jax.checkpoint) to cut activation HBM")
    p.add_argument("--remat_policy", default="full",
                   choices=["full", "minimal", "dots"],
                   help="with --remat: 'full' replays the whole block "
                        "forward in the backward (minimum HBM; flash "
                        "residuals are still saved); 'minimal' replays "
                        "EVERYTHING including the flash forward kernel "
                        "(what lets --flash fit at seq>=512); 'dots' "
                        "saves every matmul output and replays only the "
                        "cheap elementwise math (checkpoint_dots — faster "
                        "when the activations fit, OOMs at seq>=512)")
    p.add_argument("--dropout", type=float, default=0.1,
                   help="encoder dropout rate (0 disables mask generation "
                        "entirely — a bench diagnosis knob)")
    p.add_argument("--rng_impl", default="threefry",
                   choices=["threefry", "rbg"],
                   help="'rbg' uses the TPU hardware RngBitGenerator for "
                        "dropout masks (threefry mask generation is ~17%% "
                        "of 355M-block device time); random streams differ")
    p.add_argument("--compile_blocks", action="store_true")
    p.add_argument("--device_data", action="store_true")
    # --- real-data options ---
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="SST-2 TSV dir or pre-tokenized npz; synthetic if unset")
    p.add_argument("--num_meta", type=int, default=200,
                   help="balanced meta-set size (reference num_meta_total)")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="save engine checkpoint on validation improvement")
    return p.parse_args(argv)


if __name__ == "__main__":
    engine = build_engine(parse_args())
    engine.run()
