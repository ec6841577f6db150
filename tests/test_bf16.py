"""bf16 hypergradient quality (VERDICT r1 missing #5 / BASELINE.md 1e-5).

The north star is bf16 SAMA/darts on a transformer. bf16 central differences
with eps = R/||v|| are noise-dominated (bf16 carries ~3 decimal digits; the
difference of the two perturbed gradients is amplified by 1/(2 eps)), so
betty_tpu's default policy (``Config.solver_precision="fp32"``) runs the
hypergradient pipeline — direct cross-gradient + solver edges — without the
bf16 cast. Parameters are fp32 masters, so the policy makes the
hypergradient EXACTLY the fp32 one, while the inner training steps stay
bf16. This test measures both policies against the all-fp32 truth on the
transformer reweighting shape, for darts and cg."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.hypergradient import compute_path_grads
from betty_tpu.models import MetaWeightNet
from betty_tpu.models.transformer import TransformerClassifier
from betty_tpu.module import from_flax

B, SEQ, VOCAB = 16, 32, 100

rng_np = np.random.RandomState(0)
X_TR = rng_np.randint(2, VOCAB, size=(B, SEQ)).astype(np.int32)
Y_TR = rng_np.randint(0, 2, size=B).astype(np.int32)
X_ME = rng_np.randint(2, VOCAB, size=(B, SEQ)).astype(np.int32)
Y_ME = rng_np.randint(0, 2, size=B).astype(np.int32)


class Reweight(ImplicitProblem):
    def training_step(self, batch):
        ids, labels = batch
        logits = self.classifier(ids)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        ids, labels = batch
        logits = self.module(ids)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        w = self.reweight(jax.lax.stop_gradient(ce))
        return jnp.mean(w * ce)


def build(precision, solver_precision, solver="darts"):
    model = TransformerClassifier(vocab_size=VOCAB, max_len=SEQ, dim=64,
                                  depth=2, heads=4)
    clf_mod = from_flax(model, jnp.zeros((B, SEQ), jnp.int32),
                        rng=jax.random.PRNGKey(0), train_kwarg="train")
    mwn_mod = from_flax(MetaWeightNet(), jnp.zeros((B,)),
                        rng=jax.random.PRNGKey(1), train_kwarg="train")
    kw = {"cg_iterations": 3, "cg_alpha": 1.0} if solver == "cg" else {}
    reweight = Reweight(
        "reweight", module=mwn_mod, optimizer=optim.adam(lr=1e-4),
        train_data_loader=[(jnp.asarray(X_ME), jnp.asarray(Y_ME))],
        config=Config(type=solver, precision=precision,
                      solver_precision=solver_precision, **kw))
    classifier = Classifier(
        "classifier", module=clf_mod, optimizer=optim.adamw(lr=1e-4),
        train_data_loader=[(jnp.asarray(X_TR), jnp.asarray(Y_TR))],
        config=Config(type=solver, precision=precision,
                      solver_precision=solver_precision, **kw))
    engine = Engine(config=EngineConfig(train_iters=1),
                    problems=[reweight, classifier],
                    dependencies={"u2l": {reweight: [classifier]},
                                  "l2u": {classifier: [reweight]}})
    return engine, reweight, classifier


def hypergrad(engine, outer, inner):
    ctx = {n: {"params": s["params"], "extra": s["extra"]}
           for n, s in engine.states.items()}
    inner.cur_batch = (jnp.asarray(X_TR), jnp.asarray(Y_TR))
    batch = (jnp.asarray(X_ME), jnp.asarray(Y_ME))
    g = compute_path_grads(outer, ctx, engine.states, batch,
                           {"classifier": inner.cur_batch},
                           jax.random.PRNGKey(0), 1.0)
    return np.concatenate([np.asarray(x, np.float64).ravel()
                           for x in jax.tree_util.tree_leaves(g)])


def relerr(a, b):
    return float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30))


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["darts", "cg"])
def test_bf16_solver_precision_policy(solver):
    g_fp32 = hypergrad(*build("fp32", "fp32", solver))
    g_policy = hypergrad(*build("bf16", "fp32", solver))
    g_bf16 = hypergrad(*build("bf16", "bf16", solver))

    err_policy = relerr(g_fp32, g_policy)
    err_bf16 = relerr(g_fp32, g_bf16)
    print(f"{solver}: rel err policy(fp32 solver)={err_policy:.3e}, "
          f"all-bf16={err_bf16:.3e}")

    # the default policy reproduces the fp32 hypergradient (params are fp32
    # masters; the cast is skipped, so the computation is identical)
    assert err_policy < 1e-6, err_policy
    # all-bf16 must at least be finite and in the right direction; its
    # measured error is the documented cost of solver_precision="bf16"
    assert np.all(np.isfinite(g_bf16))
    cos = float(g_fp32 @ g_bf16 /
                (np.linalg.norm(g_fp32) * np.linalg.norm(g_bf16) + 1e-30))
    assert cos > 0.5, (cos, err_bf16)
