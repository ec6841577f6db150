"""Per-workload QUALITY gates (VERDICT r2 #4): each workload family must
MOVE its metric by a margin, not merely execute. Synthetic, CI-runnable
counterparts of the reference's accuracy tables
(``/root/reference/examples/*/README.md``):

* iMAML: meta-trained initialization adapts better than an untrained one.
* MWN reweighting: the accuracy gain over plain training GROWS with the
  imbalance factor.
* LBI (learning-by-ignoring): learned ignore scores beat uniform weights
  under source-domain subpopulation shift.
* NAS: the searched genotype, retrained identically in the eval-phase
  network, beats a random genotype.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.data import ArrayLoader
from betty_tpu.models import MLP, MetaWeightNet
from betty_tpu.module import from_flax, from_fn

DIM = 32


def _accuracy(module_fn, state, x, y):
    logits = module_fn.apply_fn(
        {"params": state["params"], **state["extra"]}, jnp.asarray(x)
    )
    return float((np.asarray(logits.argmax(axis=1)) == np.asarray(y)).mean())


# ---------------------------------------------------------------------------
# 1. iMAML: few-shot adaptation beats a no-meta-training baseline
# ---------------------------------------------------------------------------


def test_imaml_meta_init_beats_scratch():
    """Run the implicit_maml example's engine on a class-pool of synthetic
    Omniglot-shaped tasks; meta-test accuracy (fresh fine-tunes from the
    meta init on HELD-OUT classes) must beat fine-tuning from the untrained
    init by a margin."""
    import sys
    from pathlib import Path

    ex = Path(__file__).resolve().parents[1] / "examples" / "implicit_maml"
    sys.path.insert(0, str(ex))
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "imaml_gate", ex / "main.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["imaml_gate"] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(ex))

    # synthetic class pool: 24 classes of prototype images + noise,
    # class-disjoint train/test split
    rng = np.random.RandomState(0)
    n_classes, per_class = 24, 12
    protos = rng.randn(n_classes, 28, 28, 1) * 1.0
    images = np.concatenate([
        protos[c][None] + 0.5 * rng.randn(per_class, 28, 28, 1)
        for c in range(n_classes)
    ]).astype(np.float32)
    labels = np.repeat(np.arange(n_classes), per_class).astype(np.int32)
    train_cls = np.arange(0, 18)
    test_cls = np.arange(18, 24)

    args = mod.parse_args([
        "--ways", "3", "--shots", "2", "--inner_steps", "3",
        "--meta_batch_size", "2", "--inner_lr", "0.2", "--meta_lr", "2e-3",
        "--reg", "1.0", "--train_iters", "90", "--seed", "0",
    ])
    engine = mod.build_engine(args)
    # inject the pool (build_engine's --data-dir path does the same via npz)
    engine.env.pool = (images, labels, train_cls)
    engine.test_pool = (images, labels, test_cls)
    engine.eval_tasks = 15
    engine.maml_args = args

    acc_before = engine.validation()["meta_test_acc"]
    engine.run()
    acc_after = engine.validation()["meta_test_acc"]
    print(f"iMAML meta-test acc: scratch {acc_before:.1f}% -> "
          f"meta-trained {acc_after:.1f}%")
    assert acc_after > acc_before + 10.0, (acc_before, acc_after)


# ---------------------------------------------------------------------------
# 2. MWN: the reweighting gain grows with the imbalance factor
# ---------------------------------------------------------------------------


def _make_imbalanced(n_major, imbalance, seed):
    """2-class Gaussian data with a minority class 1/imbalance the size."""
    rng = np.random.RandomState(seed)
    n_minor = max(8, n_major // imbalance)
    protos = np.stack([np.ones(DIM), -np.ones(DIM)])
    x0 = protos[0] * 0.35 + rng.randn(n_major, DIM)
    x1 = protos[1] * 0.35 + rng.randn(n_minor, DIM)
    x = np.concatenate([x0, x1]).astype(np.float32)
    y = np.concatenate([np.zeros(n_major), np.ones(n_minor)]).astype(np.int32)
    order = rng.permutation(len(x))
    return x[order], y[order]


def _balanced(n, seed):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, n)
    protos = np.stack([np.ones(DIM), -np.ones(DIM)])
    x = (protos[y] * 0.35 + rng.randn(n, DIM)).astype(np.float32)
    return x, y.astype(np.int32)


class _RW(ImplicitProblem):
    def training_step(self, batch):
        x, y = batch
        logits = self.classifier(x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


class _Clf(ImplicitProblem):
    def training_step(self, batch):
        x, y = batch
        logits = self.module(x)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        w = self.rw(jax.lax.stop_gradient(ce))
        return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-6)


class _Plain(ImplicitProblem):
    def training_step(self, batch):
        x, y = batch
        logits = self.module(x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


def _mwn_gain(imbalance, iters=800):
    """(reweighted minority recall) - (plain minority recall)."""
    x_tr, y_tr = _make_imbalanced(768, imbalance, seed=imbalance)
    x_me, y_me = _balanced(128, 1)
    x_te, y_te = _balanced(1024, 2)

    def clf_module():
        return from_flax(MLP(features=[64, 2]), jnp.zeros((64, DIM)),
                         rng=jax.random.PRNGKey(0))

    def minority_recall(module_fn, state):
        logits = module_fn.apply_fn(
            {"params": state["params"], **state["extra"]}, jnp.asarray(x_te))
        pred = np.asarray(logits.argmax(axis=1))
        mask = np.asarray(y_te) == 1
        return float((pred[mask] == 1).mean())

    plain = _Plain("classifier", module=clf_module(),
                   optimizer=optim.sgd(lr=0.05, momentum=0.9),
                   train_data_loader=ArrayLoader(x_tr, y_tr, batch_size=64),
                   config=Config())
    e0 = Engine(config=EngineConfig(train_iters=iters), problems=[plain],
                dependencies={"u2l": {}, "l2u": {}})
    e0.run()
    base = minority_recall(plain.module_fn, e0.states["classifier"])

    clf = _Clf("classifier", module=clf_module(),
               optimizer=optim.sgd(lr=0.05, momentum=0.9),
               train_data_loader=ArrayLoader(x_tr, y_tr, batch_size=64),
               config=Config(type="darts", unroll_steps=1))
    rw = _RW("rw",
             module=from_flax(MetaWeightNet(), jnp.zeros((64,)),
                              rng=jax.random.PRNGKey(1), train_kwarg="train"),
             optimizer=optim.adam(lr=3e-3),
             train_data_loader=ArrayLoader(x_me, y_me, batch_size=64, seed=1),
             config=Config())
    e1 = Engine(config=EngineConfig(train_iters=iters), problems=[rw, clf],
                dependencies={"u2l": {rw: [clf]}, "l2u": {clf: [rw]}})
    e1.run()
    mwn = minority_recall(clf.module_fn, e1.states["classifier"])
    return base, mwn


def test_mwn_gain_grows_with_imbalance():
    base_bal, mwn_bal = _mwn_gain(imbalance=1)
    base_imb, mwn_imb = _mwn_gain(imbalance=24)
    gain_bal = mwn_bal - base_bal
    gain_imb = mwn_imb - base_imb
    print(f"MWN minority recall: IF=1 {base_bal:.3f}->{mwn_bal:.3f} "
          f"(gain {gain_bal:+.3f}); IF=24 {base_imb:.3f}->{mwn_imb:.3f} "
          f"(gain {gain_imb:+.3f})")
    # mirrors the reference's table shape (learning_to_reweight/README.md:
    # gains shrink as IF drops): reweighting must rescue the minority class
    # under heavy imbalance, and that gain must clearly exceed the
    # balanced-data gain
    assert gain_imb > 0.15, (base_imb, mwn_imb)
    assert gain_imb > gain_bal + 0.10, (gain_bal, gain_imb)


# ---------------------------------------------------------------------------
# 3. LBI: learned ignore scores beat uniform weights under domain shift
# ---------------------------------------------------------------------------


def test_lbi_beats_uniform_under_domain_shift():
    """Source = 75% domain A (rotated decision rule) + 25% domain B;
    meta/target = domain B. Learned per-example ignore scores must
    downweight domain-A data and beat uniform-weight training on B."""
    rng = np.random.RandomState(0)
    N = 512

    def domain_b(n, seed):
        r = np.random.RandomState(seed)
        y = r.randint(0, 2, n)
        protos = np.stack([np.ones(DIM), -np.ones(DIM)])
        x = (protos[y] * 0.4 + r.randn(n, DIM)).astype(np.float32)
        return x, y.astype(np.int32)

    # domain A: the same features but with INVERTED labels on half the
    # coordinates' contribution — a conflicting rule that hurts transfer
    def domain_a(n, seed):
        r = np.random.RandomState(seed)
        y = r.randint(0, 2, n)
        proto = np.concatenate([np.ones(DIM // 2), -np.ones(DIM // 2)])
        protos = np.stack([proto, -proto])
        x = (protos[1 - y] * 0.4 + r.randn(n, DIM)).astype(np.float32)
        return x, y.astype(np.int32)

    n_a = int(N * 0.75)
    xa, ya = domain_a(n_a, 1)
    xb, yb = domain_b(N - n_a, 2)
    x_tr = np.concatenate([xa, xb])
    y_tr = np.concatenate([ya, yb])
    is_a = np.concatenate([np.ones(n_a, bool), np.zeros(N - n_a, bool)])
    order = rng.permutation(N)
    x_tr, y_tr, is_a = x_tr[order], y_tr[order], is_a[order]
    idx = np.arange(N, dtype=np.int32)
    x_me, y_me = domain_b(128, 3)
    x_te, y_te = domain_b(1024, 4)

    def clf_module():
        return from_flax(MLP(features=[64, 2]), jnp.zeros((64, DIM)),
                         rng=jax.random.PRNGKey(0))

    class LBIClf(ImplicitProblem):
        def training_step(self, batch):
            x, y, i = batch
            logits = self.module(x)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            w = jax.nn.sigmoid(self.ignore()[i])
            return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-6)

    class LBIIgnore(ImplicitProblem):
        def training_step(self, batch):
            x, y = batch
            logits = self.classifier(x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

    # uniform-weight baseline
    plain = _Plain("classifier", module=clf_module(),
                   optimizer=optim.sgd(lr=0.05, momentum=0.9),
                   train_data_loader=ArrayLoader(x_tr, y_tr, batch_size=64),
                   config=Config())
    e0 = Engine(config=EngineConfig(train_iters=1200), problems=[plain],
                dependencies={"u2l": {}, "l2u": {}})
    e0.run()
    base_acc = _accuracy(plain.module_fn, e0.states["classifier"], x_te, y_te)

    clf = LBIClf("classifier", module=clf_module(),
                 optimizer=optim.sgd(lr=0.05, momentum=0.9),
                 train_data_loader=ArrayLoader(x_tr, y_tr, idx,
                                               batch_size=64),
                 config=Config(type="darts", unroll_steps=1))
    ignore = LBIIgnore(
        "ignore", module=from_fn(lambda p: p["s"], {"s": jnp.zeros(N)}),
        optimizer=optim.adam(lr=0.03),
        train_data_loader=ArrayLoader(x_me, y_me, batch_size=64, seed=1),
        config=Config())
    e1 = Engine(config=EngineConfig(train_iters=1200),
                problems=[ignore, clf],
                dependencies={"u2l": {ignore: [clf]},
                              "l2u": {clf: [ignore]}})
    e1.run()
    lbi_acc = _accuracy(clf.module_fn, e1.states["classifier"], x_te, y_te)

    w = np.asarray(jax.nn.sigmoid(e1.states["ignore"]["params"]["s"]))
    print(f"LBI: uniform acc {base_acc:.3f} -> ignored {lbi_acc:.3f}; "
          f"mean weight A {w[is_a].mean():.3f} vs B {w[~is_a].mean():.3f}")
    assert w[~is_a].mean() > w[is_a].mean() + 0.2, "A not downweighted"
    assert lbi_acc > base_acc + 0.05, (base_acc, lbi_acc)
