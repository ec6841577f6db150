"""3-level NAS-augmented image captioning (IUC program).

Capability port of reference
``examples/nas_augmented_image_captioning_3_level/train_search_IUC.py``:
3 problems — ``outer`` (architecture) <- ``inner2`` (pseudo-data learner) <-
``inner1`` (captioner) with graph
``l2u={inner1:[inner2, outer], inner2:[outer]}``,
``u2l={outer:[inner2, inner1]}`` and a first-order outer
(reference :472-488). The program is faithful:

* **inner1** is a REAL sequence-to-sequence captioner — architecture-mixed
  image encoder -> transformer decoder with causal self-attention and
  cross-attention — trained with teacher forcing (caption[:-1] -> shifted
  targets, EOS/pad-masked token CE), matching the reference's
  ``module.loss(input, alphas, captions, lengths)``.
* **inner2** trains a second captioner (the "learner") on a PSEUDO dataset:
  inner1 greedy-decodes captions for unlabeled external images inside the
  jitted step (``lax.scan`` over positions, stop-gradient — the
  reference's ``get_pseudo_loader`` + ``.detach()``), and the learner
  fits those pseudo pairs conditioned on the same alphas.
* **outer** holds the architecture mixing weights and trains on inner1's
  validation caption loss (reference Outer.training_step).

The reference trains on COCO; this environment has no dataset egress, so
images are synthetic: a scene is a bag of object tokens, the "image" is the
sum of fixed random object embeddings + noise, and the caption lists the
objects in order (BOS ... EOS pad*). ``--data-dir`` ingests a real
pre-tokenized npz (``feats (N,F)``, ``captions (N,L)`` with BOS=1/EOS=2/
PAD=0) for COCO-style runs. Validation greedy-decodes held-out images and
reports masked token accuracy + exact-match rate (the no-egress stand-in
for BLEU/CIDEr, reference eval_cider.py).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.module import from_flax, from_fn

PAD, BOS, EOS = 0, 1, 2


# ---------------------------------------------------------------------------
# synthetic scenes: image = sum of object embeddings, caption = object list
# ---------------------------------------------------------------------------


def make_caption_data(n, seq_len, vocab, feat_dim, seed, noise=0.1):
    rng = np.random.RandomState(seed)
    obj_emb = np.random.RandomState(1234).randn(vocab, feat_dim)
    feats = np.zeros((n, feat_dim), np.float32)
    caps = np.full((n, seq_len), PAD, np.int32)
    caps[:, 0] = BOS
    max_objs = seq_len - 2
    for i in range(n):
        k = rng.randint(2, max_objs + 1)
        objs = rng.choice(np.arange(3, vocab), size=k, replace=False)
        feats[i] = obj_emb[objs].sum(0) + noise * rng.randn(feat_dim)
        caps[i, 1 : 1 + k] = np.sort(objs)  # canonical order
        caps[i, 1 + k] = EOS
    return feats, caps


# ---------------------------------------------------------------------------
# the captioner: mixed encoder -> causal transformer decoder
# ---------------------------------------------------------------------------


class DecoderBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, memory, causal_mask, train=True):
        y = nn.LayerNorm()(x)
        y = nn.SelfAttention(num_heads=self.heads, qkv_features=self.dim,
                             deterministic=True)(y, mask=causal_mask)
        x = x + y
        y = nn.LayerNorm()(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, deterministic=True
        )(y, memory)  # cross-attention to the encoded image
        x = x + y
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.dim * 4)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class Captioner(nn.Module):
    """Architecture-mixed encoder + teacher-forced decoder.

    ``alphas`` (2,) softmax-mixes two encoder branches — a capable gelu-MLP
    vs a fixed chaotic random-feature map (``sin`` of a high-gain frozen
    projection: full-rank but non-smooth, so object identity is not
    linearly recoverable and any weight on it injects structured garbage
    into the decoder's memory) — the NAS surface of the reference's
    ``Architecture`` cell, scaled to this program: select the informative
    operation, suppress the noisy one. The searched alphas must discover
    the capable branch; the quality gate (tests/test_quality_gates2.py)
    asserts captioners trained under the searched mixture beat ones
    trained under the anti-searched mixture on held-out exact match."""

    vocab: int
    dim: int = 64
    depth: int = 2
    heads: int = 4
    max_len: int = 16
    mem_tokens: int = 4

    def setup(self):
        self.enc_deep = [nn.Dense(self.dim * 2), nn.Dense(self.mem_tokens * self.dim)]
        # per-branch normalization before mixing (the BN-at-op-end of real
        # DARTS search spaces): without it a high-variance branch wins as a
        # pure amplitude knob regardless of information content
        self.enc_norm_a = nn.LayerNorm()
        self.enc_norm_b = nn.LayerNorm()
        self.tok_emb = nn.Embed(self.vocab, self.dim)
        self.pos_emb = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (1, self.max_len, self.dim),
        )
        self.blocks = [
            DecoderBlock(self.dim, self.heads) for _ in range(self.depth)
        ]
        self.out_ln = nn.LayerNorm()
        self.out_proj = nn.Dense(self.vocab)

    def encode(self, feats, alphas):
        w = jax.nn.softmax(alphas)
        deep = feats
        for i, layer in enumerate(self.enc_deep):
            deep = layer(deep)
            if i < len(self.enc_deep) - 1:
                deep = nn.gelu(deep)
        # chaotic random-feature branch: a frozen high-gain projection
        # through sin (trace-time constant, not a parameter) — full-rank
        # but non-smooth, so the object set is not linearly recoverable;
        # any mixing weight on it injects structured garbage into the
        # decoder's memory. The search must learn to suppress it.
        proj = jax.random.normal(
            jax.random.PRNGKey(1234),
            (feats.shape[-1], self.mem_tokens * self.dim),
        )
        wide = jnp.sin(feats @ (4.0 * proj))
        mixed = w[0] * self.enc_norm_a(deep) + w[1] * self.enc_norm_b(wide)
        return mixed.reshape(feats.shape[0], self.mem_tokens, self.dim)

    def __call__(self, feats, alphas, caption_in, train=True):
        """Teacher forcing: logits for positions 1..L given caption[:-1]."""
        memory = self.encode(feats, alphas)
        L = caption_in.shape[1]
        x = self.tok_emb(caption_in) + self.pos_emb[:, :L]
        causal = nn.make_causal_mask(caption_in)
        for blk in self.blocks:
            x = blk(x, memory, causal, train=train)
        return self.out_proj(self.out_ln(x))


def caption_loss(logits, targets):
    """EOS/pad-masked token cross entropy (reference masks by lengths)."""
    mask = (targets != PAD).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def greedy_decode(apply_fn, variables, feats, alphas, seq_len):
    """Autoregressive argmax decoding inside jit (lax.scan over positions);
    counterpart of the reference's ``_decoder.sample`` for pseudo-caption
    generation. Differentiation is cut by the caller (stop_gradient)."""
    B = feats.shape[0]
    caps = jnp.full((B, seq_len), PAD, jnp.int32).at[:, 0].set(BOS)

    def step(caps, t):
        logits = apply_fn(variables, feats, alphas, caps, train=False)
        nxt = jnp.argmax(logits[:, t - 1], axis=-1).astype(jnp.int32)
        return caps.at[:, t].set(nxt), None

    caps, _ = jax.lax.scan(step, caps, jnp.arange(1, seq_len))
    return caps


# ---------------------------------------------------------------------------
# the three problems (reference train_search_IUC.py:227-412)
# ---------------------------------------------------------------------------


class Outer(ImplicitProblem):
    """Architecture alphas; loss = inner1's validation caption loss."""

    def training_step(self, batch):
        feats, caps = batch
        logits = self.inner1.module(feats, self.params["w"], caps[:, :-1])
        return caption_loss(logits, caps[:, 1:])


class Inner2(ImplicitProblem):
    """Pseudo-data learner: fit inner1's greedy-decoded captions on
    external images, conditioned on the same alphas."""

    def training_step(self, batch):
        feats, _ = batch  # external split: captions unused (unlabeled)
        alphas = self.outer.params["w"]
        pseudo = jax.lax.stop_gradient(
            greedy_decode(
                self.inner1.module_fn.apply,
                {"params": self.inner1.params},
                feats, alphas, self.cfg["seq_len"],
            )
        )
        logits = self.module(feats, alphas, pseudo[:, :-1])
        return caption_loss(logits, pseudo[:, 1:])


class Inner1(ImplicitProblem):
    """The captioner: teacher-forced CE on real pairs + distillation from
    the learner's pseudo-consistency (couples inner2 -> inner1 so the
    l2u={inner1:[inner2,...]} edge carries signal, as in the reference
    where the pseudo loader is built from inner1)."""

    def training_step(self, batch):
        feats, caps = batch
        alphas = self.outer.params["w"]
        logits = self.module(feats, alphas, caps[:, :-1])
        real = caption_loss(logits, caps[:, 1:])
        learner_logits = self.inner2.module(feats, alphas, caps[:, :-1])
        distill = -jnp.mean(
            jnp.sum(
                jax.nn.softmax(learner_logits)
                * jax.nn.log_softmax(logits), axis=-1
            )
        )
        return real + self.cfg["distill"] * distill


class IUCEngine(Engine):
    """Greedy-decode held-out images each validation; report masked token
    accuracy and exact-match (no-egress BLEU/CIDEr stand-in, reference
    eval_cider.py)."""

    test_data = None

    def validation(self):
        if self.test_data is None:
            return {}
        feats, caps = self.test_data
        alphas = self.states["outer"]["params"]["w"]
        decoded = greedy_decode(
            self.inner1.module_fn.apply,
            {"params": self.states["inner1"]["params"]},
            jnp.asarray(feats), alphas, caps.shape[1],
        )
        decoded = np.asarray(decoded)
        mask = caps != PAD
        # skip BOS (given) in scoring
        mask[:, 0] = False
        tok_acc = float((decoded == caps)[mask].mean()) * 100.0
        exact = float(
            ((decoded == caps) | ~mask).all(axis=1).mean()
        ) * 100.0
        return {"caption_acc": tok_acc, "caption_exact": exact}


def build_engine(args):
    feat_dim = getattr(args, "feat_dim", 32)
    if getattr(args, "data_dir", None):
        d = np.load(args.data_dir)
        feats = np.asarray(d["feats"], np.float32)
        caps = np.asarray(d["captions"], np.int32)
        args.seq_len = caps.shape[1]
        args.vocab = int(caps.max()) + 1
        feat_dim = feats.shape[1]
        third = len(caps) // 3
        f_tr, c_tr = feats[:third], caps[:third]
        f_ext, c_ext = feats[third : 2 * third], caps[third : 2 * third]
        f_val, c_val = feats[2 * third :], caps[2 * third :]
    else:
        f_tr, c_tr = make_caption_data(args.n, args.seq_len, args.vocab,
                                       feat_dim, 0)
        f_ext, c_ext = make_caption_data(args.n, args.seq_len, args.vocab,
                                         feat_dim, 1)
        f_val, c_val = make_caption_data(args.n, args.seq_len, args.vocab,
                                         feat_dim, 2)

    holdout = max(len(c_val) // 5, 1)
    f_test, c_test = f_val[-holdout:], c_val[-holdout:]
    f_val, c_val = f_val[:-holdout], c_val[:-holdout]

    def loader(f, c):
        return [(f[i : i + args.batch], c[i : i + args.batch])
                for i in range(0, len(c) - args.batch + 1, args.batch)]

    def captioner(seed):
        model = Captioner(vocab=args.vocab, dim=args.dim, depth=args.depth,
                          heads=args.heads, max_len=args.seq_len)
        return from_flax(
            model,
            jnp.zeros((args.batch, feat_dim), jnp.float32),
            jnp.zeros(2, jnp.float32),
            jnp.zeros((args.batch, args.seq_len - 1), jnp.int32),
            rng=jax.random.PRNGKey(seed), train_kwarg="train",
        )

    outer = Outer(
        name="outer",
        module=from_fn(lambda p: p["w"], {"w": jnp.zeros(2)}),
        optimizer=optim.adam(lr=args.arch_lr, betas=(0.5, 0.999)),
        train_data_loader=loader(f_val, c_val),
        config=Config(type="darts", first_order=True, log_step=args.log_step),
    )
    inner2 = Inner2(
        name="inner2",
        module=captioner(1),
        optimizer=optim.sgd(lr=args.learner_lr, momentum=0.9),
        train_data_loader=loader(f_ext, c_ext),
        config=Config(type="darts", unroll_steps=args.unroll2),
        extra_config={"seq_len": args.seq_len},
    )
    inner1 = Inner1(
        name="inner1",
        module=captioner(0),
        optimizer=optim.sgd(lr=args.captioner_lr, momentum=0.9),
        train_data_loader=loader(f_tr, c_tr),
        config=Config(type="darts", unroll_steps=args.unroll1),
        extra_config={"distill": args.distill},
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
    engine.test_data = (f_test, c_test)
    return engine


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq_len", type=int, default=12)
    p.add_argument("--vocab", type=int, default=64)
    p.add_argument("--feat_dim", type=int, default=32)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--unroll1", type=int, default=2)
    p.add_argument("--unroll2", type=int, default=2)
    p.add_argument("--captioner_lr", type=float, default=0.1)
    p.add_argument("--arch_lr", type=float, default=1e-3,
                   help="outer (architecture) Adam learning rate")
    p.add_argument("--learner_lr", type=float, default=0.05)
    p.add_argument("--distill", type=float, default=0.1)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--valid_step", type=int, default=50)
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="npz with feats (N,F) + captions (N,L) "
                        "(BOS=1/EOS=2/PAD=0); synthetic scenes if unset")
    return p.parse_args(argv)


if __name__ == "__main__":
    engine = build_engine(parse_args())
    engine.run()
    print(engine.validation())
