"""Per-workload QUALITY gates (VERDICT r2 #4): each workload family must
MOVE its metric by a margin, not merely execute. Synthetic, CI-runnable
counterparts of the reference's accuracy tables
(``/root/reference/examples/*/README.md``):

* iMAML: meta-trained initialization adapts better than an untrained one
  on held-out classes.
* MWN reweighting: the accuracy gain over plain training GROWS with the
  label-corruption level (the data pathology the loss-conditioned MWN can
  detect at CI scale; class imbalance needs the reference's 100-epoch
  ResNet horizon to move).
* LBI (learning-by-ignoring): learned ignore scores isolate the
  negative-transfer source domain and beat uniform weights on the target.
* PPO: the trained policy's rollout return beats the untrained policy 3x.

The DARTS NAS gate lives in test_quality_gates_nas.py (its supernet
compile alone needs most of a CI window — measured 558s; the four gates
here total ~160s warm on the single-core CI host). The round-4 gates for
the remaining families (SANAS, bert/SAMA, IUC, robust_nas) live in
test_quality_gates2.py.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.data import ArrayLoader
from betty_tpu.models import MLP, MetaWeightNet
from betty_tpu.module import from_flax, from_fn

pytestmark = pytest.mark.slow  # multi-minute training-quality gates

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

    # Omniglot-like synthetic pool with SHARED structure across tasks: a
    # dictionary of smooth "stroke" blobs; each class = superposition of 3
    # strokes. Stroke-detecting conv features transfer across tasks, which
    # is what meta-training must discover. Class-disjoint train/test split.
    rng = np.random.RandomState(0)
    n_classes, per_class, n_strokes = 30, 12, 40
    yy, xx = np.mgrid[0:28, 0:28]
    strokes = []
    for _ in range(n_strokes):
        cx, cy = rng.uniform(4, 24, 2)
        sx, sy = rng.uniform(2, 6, 2)
        th = rng.uniform(0, np.pi)
        a = ((xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)) / sx
        b = (-(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)) / sy
        strokes.append(np.exp(-(a ** 2 + b ** 2)))
    strokes = np.stack(strokes)
    protos = np.zeros((n_classes, 28, 28))
    for c in range(n_classes):
        idx = rng.choice(n_strokes, 3, replace=False)
        protos[c] = strokes[idx].sum(0)
    protos = (protos - protos.mean()) / (protos.std() + 1e-6)
    images = np.concatenate([
        (protos[c][None] + 0.3 * rng.randn(per_class, 28, 28))[..., None]
        for c in range(n_classes)
    ]).astype(np.float32)
    labels = np.repeat(np.arange(n_classes), per_class).astype(np.int32)
    train_cls = np.arange(0, 22)
    test_cls = np.arange(22, 30)

    args = mod.parse_args([
        "--ways", "3", "--shots", "2", "--inner_steps", "3",
        "--meta_batch_size", "2", "--inner_lr", "0.3", "--meta_lr", "2e-3",
        "--reg", "1.0", "--train_iters", "300", "--seed", "0",
    ])
    engine = mod.build_engine(args)
    # inject the pool (build_engine's --data-dir path does the same via npz)
    engine.env.pool = (images, labels, train_cls)
    engine.test_pool = (images, labels, test_cls)
    engine.eval_tasks = 30
    engine.maml_args = args

    acc_before = engine.validation()["meta_test_acc"]
    engine.run()
    acc_after = engine.validation()["meta_test_acc"]
    print(f"iMAML meta-test acc: scratch {acc_before:.1f}% -> "
          f"meta-trained {acc_after:.1f}%")
    # measured 34.4 -> 53.1 in the 8-virtual-device test env (meta_lr
    # 5e-3 was unstable at longer horizons; 2e-3 is the tuned setting);
    # gate at +8pp over the scratch baseline
    assert acc_after > acc_before + 8.0, (acc_before, acc_after)


# ---------------------------------------------------------------------------
# 2. MWN: the reweighting gain grows with the corruption level
# ---------------------------------------------------------------------------


def _noisy(n, corruption, seed):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, n)
    protos = np.stack([np.ones(DIM), -np.ones(DIM)])
    x = (protos[y] * 0.4 + rng.randn(n, DIM)).astype(np.float32)
    flips = rng.rand(n) < corruption
    y = np.where(flips, 1 - y, y)
    return x, y.astype(np.int32)


def _clean(n, seed):
    return _noisy(n, 0.0, seed)


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


def _mwn_gain(corruption, iters=1500):
    """(reweighted clean-test acc) - (plain clean-test acc) at the given
    label-corruption rate."""
    x_tr, y_tr = _noisy(2048, corruption, seed=int(corruption * 100))
    x_me, y_me = _clean(256, 1)
    x_te, y_te = _clean(2048, 2)

    def clf_module():
        return from_flax(MLP(features=[128, 64, 2]), jnp.zeros((128, DIM)),
                         rng=jax.random.PRNGKey(0))

    plain = _Plain("classifier", module=clf_module(),
                   optimizer=optim.sgd(lr=0.01, momentum=0.9),
                   train_data_loader=ArrayLoader(x_tr, y_tr, batch_size=128),
                   config=Config())
    e0 = Engine(config=EngineConfig(train_iters=iters), problems=[plain],
                dependencies={"u2l": {}, "l2u": {}})
    e0.run()
    base = _accuracy(plain.module_fn, e0.states["classifier"], x_te, y_te)

    clf = _Clf("classifier", module=clf_module(),
               optimizer=optim.sgd(lr=0.01, momentum=0.9),
               train_data_loader=ArrayLoader(x_tr, y_tr, batch_size=128),
               config=Config(type="cg", cg_iterations=3, cg_alpha=1.0,
                             unroll_steps=1))
    rw = _RW("rw",
             module=from_flax(MetaWeightNet(), jnp.zeros((128,)),
                              rng=jax.random.PRNGKey(1), train_kwarg="train"),
             optimizer=optim.adam(lr=3e-3),
             train_data_loader=ArrayLoader(x_me, y_me, batch_size=128,
                                           seed=1),
             config=Config())
    e1 = Engine(config=EngineConfig(train_iters=iters), problems=[rw, clf],
                dependencies={"u2l": {rw: [clf]}, "l2u": {clf: [rw]}})
    e1.run()
    mwn = _accuracy(clf.module_fn, e1.states["classifier"], x_te, y_te)
    return base, mwn


def test_mwn_gain_grows_with_corruption():
    """The reference's flagship MWN evidence is an accuracy table whose
    gains grow with the data pathology (learning_to_reweight/README.md).
    CI form: the loss-conditioned reweighter must rescue clean-test
    accuracy under 40% label noise, and that gain must clearly exceed the
    (near-zero) gain on clean data."""
    base_c, mwn_c = _mwn_gain(0.0)
    base_n, mwn_n = _mwn_gain(0.4)
    gain_c = mwn_c - base_c
    gain_n = mwn_n - base_n
    print(f"MWN clean-test acc: corruption=0 {base_c:.3f}->{mwn_c:.3f} "
          f"(gain {gain_c:+.3f}); corruption=0.4 {base_n:.3f}->{mwn_n:.3f} "
          f"(gain {gain_n:+.3f})")
    assert gain_n > 0.05, (base_n, mwn_n)
    assert gain_n > gain_c + 0.04, (gain_c, gain_n)


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

    # domain A: the same feature clusters but the OPPOSITE labeling rule
    # (the classic negative-transfer source LBI exists to ignore,
    # reference examples/learning_by_ignoring/README.md) — training on it
    # uniformly actively destroys target accuracy
    def domain_a(n, seed):
        r = np.random.RandomState(seed)
        y = r.randint(0, 2, n)
        protos = np.stack([np.ones(DIM), -np.ones(DIM)])
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
    e0 = Engine(config=EngineConfig(train_iters=2500), problems=[plain],
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
    e1 = Engine(config=EngineConfig(train_iters=2500),
                problems=[ignore, clf],
                dependencies={"u2l": {ignore: [clf]},
                              "l2u": {clf: [ignore]}})
    e1.run()
    lbi_acc = _accuracy(clf.module_fn, e1.states["classifier"], x_te, y_te)

    w = np.asarray(jax.nn.sigmoid(e1.states["ignore"]["params"]["s"]))

    # deployment phase (the reference's LBI pipeline retrains with the
    # learned ignore decisions — pretrain -> finetune): a FRESH classifier
    # trained on the examples the bilevel KEPT (keep-probability > 0.5;
    # soft weights leave ~16% adversarial loss mass that slows recovery)
    # must solve the target domain
    w_frozen = jnp.asarray((w > 0.5).astype(np.float32))

    class Weighted(ImplicitProblem):
        def training_step(self, batch):
            x, y, i = batch
            logits = self.module(x)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            ww = w_frozen[i]
            return jnp.sum(ww * ce) / jnp.maximum(jnp.sum(ww), 1e-6)

    wtr = Weighted("classifier", module=clf_module(),
                   optimizer=optim.sgd(lr=0.05, momentum=0.9),
                   train_data_loader=ArrayLoader(x_tr, y_tr, idx,
                                                 batch_size=64),
                   config=Config())
    e2 = Engine(config=EngineConfig(train_iters=1200), problems=[wtr],
                dependencies={"u2l": {}, "l2u": {}})
    e2.run()
    retrain_acc = _accuracy(wtr.module_fn, e2.states["classifier"],
                            x_te, y_te)

    print(f"LBI: uniform acc {base_acc:.3f} -> ignored {lbi_acc:.3f} -> "
          f"retrained-with-weights {retrain_acc:.3f}; "
          f"mean weight A {w[is_a].mean():.3f} vs B {w[~is_a].mean():.3f}")
    assert w[~is_a].mean() > w[is_a].mean() + 0.2, "A not downweighted"
    assert lbi_acc > base_acc + 0.10, (base_acc, lbi_acc)
    assert retrain_acc > 0.9, retrain_acc


# ---------------------------------------------------------------------------
# 5. PPO: the policy actually improves over an untrained one
# ---------------------------------------------------------------------------


def test_ppo_policy_improves():
    """The PPO example (Actor/Critic problems + rollout Env) must move the
    mean per-rollout return well beyond the untrained policy's, not merely
    execute (the smoke test in test_examples2 asserts > 0 only). Measured
    with this seed: untrained ~22, after 60 rollouts ~128; gate at 3x."""
    import sys
    from pathlib import Path

    ex = Path(__file__).resolve().parents[1] / "examples" / "ppo"
    import importlib.util

    spec = importlib.util.spec_from_file_location("ppo_gate", ex / "main.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ppo_gate"] = mod
    spec.loader.exec_module(mod)

    def build(iters):
        args = type("A", (), dict(
            n_envs=8, horizon=128, train_iters=iters, epochs_per_rollout=4,
            seed=0, log_step=-1,
        ))
        return mod.build_engine(args)

    # untrained-policy return: the Env samples its first rollout at
    # construction time, before any update
    untrained = build(0).env.mean_return
    engine = build(60)
    engine.run()
    trained = engine.env.mean_return
    print(f"PPO mean rollout return: untrained {untrained:.1f} -> "
          f"trained {trained:.1f}")
    assert trained > 3.0 * untrained, (untrained, trained)
    assert trained > 80.0, trained
