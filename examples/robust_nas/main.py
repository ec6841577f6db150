"""Robust NAS (DSRNA-style): DARTS search with robustness regularizers.

Capability port of reference ``examples/robust_nas/`` — bilevel architecture
search whose inner objective adds input-Jacobian and curvature (Hessian-
quadratic-form) regularizers (reference ``regularizer.py:16-30``, which uses
an example-local ``hessianflow`` library). In JAX both regularizers are a
couple of ``jax.jvp`` calls inside the jitted step — no external Hessian
library needed.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.models.darts import DARTSNetwork, derive_genotype, init_alphas
from betty_tpu.module import from_flax, from_fn

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "learning_to_reweight"))
from main import BatchLoader, make_synthetic_cifar  # noqa: E402


def ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def jacobian_reg(loss_fn, x, rng):
    """E‖J_x L · u‖² via one JVP with a random direction (finite-sample
    estimator of the input-Jacobian Frobenius norm)."""
    u = jax.random.normal(rng, x.shape)
    u = u / (jnp.sqrt(jnp.sum(u**2)) + 1e-12)
    _, jvp = jax.jvp(loss_fn, (x,), (u,))
    return jvp**2


def curvature_reg(loss_fn, x, rng, iters=5):
    """Largest eigenvalue of the INPUT Hessian by power iteration over
    Hessian-vector products — the DSRNA curvature MONITOR (reference
    ``examples/robust_nas/hessianflow`` ``get_eigen``: normalize v, iterate
    v <- Hv/||Hv||, eigenvalue = <v, Hv>). HVPs are forward-over-reverse
    (``jax.jvp`` of ``jax.grad``), so the whole estimate stays inside the
    jitted step — no external Hessian library.

    The returned Rayleigh quotient is differentiable w.r.t. the network
    parameters THROUGH H; the converged eigenvector is treated as a
    constant (``stop_gradient``), which is exact at convergence by
    eigenvector stationarity and keeps the backward graph second-order.
    NOTE: as a TRAINING penalty this is ill-conditioned — d(Hv/||Hv||)
    blows up as ||Hv|| -> 0 (confident softmax => H -> 0), which is why
    the reference trains with the finite-difference proxy below
    (:func:`cure_reg`) and uses eigenvalues for monitoring only."""

    def hvp(v):
        return jax.jvp(jax.grad(loss_fn), (x,), (v,))[1]

    v = jax.random.normal(rng, x.shape)
    v = v / (jnp.sqrt(jnp.sum(v**2)) + 1e-12)

    def body(_, v):
        hv = hvp(v)
        return hv / (jnp.sqrt(jnp.sum(hv**2)) + 1e-12)

    v = jax.lax.stop_gradient(jax.lax.fori_loop(0, iters, body, v))
    return jnp.sum(v * hvp(v))


def cure_reg(loss_fn, x, h=1.0):
    """CURE-style finite-difference curvature penalty — the regularizer
    DSRNA actually TRAINS with (reference ``regularizer.py`` ``loss_curv``:
    z = sign of the input gradient, detached and normalized per example to
    length ``h``; penalty = E ||nabla L(x + z) - nabla L(x)|| — a
    directional-curvature magnitude along the adversarially-relevant
    direction, differentiable and well-conditioned where the power-
    iteration Rayleigh quotient is not)."""
    g = jax.grad(loss_fn)(x)
    z = jnp.sign(jax.lax.stop_gradient(g))
    flat = z.reshape(z.shape[0], -1)
    norm = jnp.sqrt(jnp.sum(flat**2, axis=1) + 1e-12)
    z = h * z / norm.reshape((-1,) + (1,) * (z.ndim - 1))
    diff = jax.grad(loss_fn)(x + z) - g
    per_ex = jnp.sqrt(
        jnp.sum(diff.reshape(diff.shape[0], -1) ** 2, axis=1) + 1e-12
    )
    return jnp.mean(per_ex)


class Arch(ImplicitProblem):
    def training_step(self, batch):
        inputs, labels = batch
        logits = self.classifier.module(inputs, self.params)
        return ce(logits, labels)


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        inputs, labels = batch
        alphas = self.arch.params
        logits = self.module(inputs, alphas)
        loss = ce(logits, labels)

        def input_loss(x):
            return ce(self.module(x, alphas), labels)

        rng = self.rng
        total = loss
        # zero-coefficient regularizers are skipped entirely: each one adds a
        # second-order term to the compiled graph
        if self.cfg["lambda_j"]:
            total = total + self.cfg["lambda_j"] * jacobian_reg(
                input_loss, inputs, rng
            )
        if self.cfg["lambda_c"]:
            # CURE finite-difference curvature (what the reference trains
            # with); the power-iteration eigenvalue (curvature_reg) is the
            # monitoring/evaluation metric, as in the reference
            total = total + self.cfg["lambda_c"] * cure_reg(
                input_loss, inputs
            )
        return {"loss": total, "ce": loss}


class RobustSearchEngine(Engine):
    """Genotype extraction + test accuracy at each validation (reference
    dsrna_search.py logs val acc and saves genotypes per epoch)."""

    test_data = None

    def validation(self):
        genotype = derive_genotype(self.arch.params)
        self.logger.info(f"genotype = {genotype}")
        out = {}
        if self.test_data is not None:
            sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
            from vision_data import problem_accuracy

            x, y = self.test_data
            alphas = self.arch.params
            out["test_acc"] = problem_accuracy(
                lambda xb: self.classifier.module(xb, alphas), x, y
            )
        return out


def build_engine(args):
    test_data = None
    if getattr(args, "data_dir", None):
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from vision_data import load_classification

        x_all, y_all, x_test, y_test = load_classification(args.data_dir)
        half = len(y_all) // 2
        x_train, y_train = x_all[:half], y_all[:half]
        x_val, y_val = x_all[half:], y_all[half:]
        test_data = (x_test, y_test)
    else:
        x_train, y_train = make_synthetic_cifar(args.train_size, seed=0)
        x_val, y_val = make_synthetic_cifar(args.train_size, seed=1)

    sample = jnp.zeros((args.batch_size, 32, 32, 3), jnp.float32)
    if getattr(args, "arch", "darts") == "mlp":
        # lightweight backbone for CI smoke: second-order-through-supernet
        # compile cost is prohibitive on CPU test machines
        import flax.linen as nn

        class MixMLP(nn.Module):
            @nn.compact
            def __call__(self, x, alphas, train=True):
                # mix two heads with the first normal-cell edge's alphas so
                # the arch problem stays differentiably coupled; gelu keeps
                # the input Hessian nonzero (relu is piecewise-linear, so
                # the curvature regularizer would see ~0 once confident)
                w = jax.nn.softmax(alphas["normal"][0, :2])
                x = x.reshape(x.shape[0], -1)
                x = nn.gelu(nn.Dense(32)(x))
                return w[0] * nn.Dense(10)(x) + w[1] * nn.Dense(10)(x)

        supernet = from_flax(MixMLP(), sample, init_alphas(),
                             rng=jax.random.PRNGKey(0), train_kwarg="train")
    else:
        net = DARTSNetwork(channels=args.channels, layers=args.layers,
                           num_classes=10)
        supernet = from_flax(net, sample, init_alphas(),
                             rng=jax.random.PRNGKey(0), train_kwarg="train")

    arch = Arch(
        name="arch",
        module=from_fn(lambda p: p, init_alphas(jax.random.PRNGKey(1))),
        optimizer=optim.adam(lr=3e-4, betas=(0.5, 0.999), weight_decay=1e-3),
        train_data_loader=BatchLoader(x_val, y_val, args.batch_size, seed=1),
        config=Config(type="darts", log_step=args.log_step),
    )
    classifier = Classifier(
        name="classifier",
        module=supernet,
        optimizer=optim.sgd(lr=args.lr, momentum=0.9, weight_decay=3e-4),
        train_data_loader=BatchLoader(x_train, y_train, args.batch_size,
                                      seed=0),
        config=Config(type="darts", unroll_steps=args.unroll_steps,
                      log_step=args.log_step),
        extra_config={"lambda_j": args.lambda_j, "lambda_c": args.lambda_c},
    )
    engine = RobustSearchEngine(
        config=EngineConfig(train_iters=args.train_iters,
                            valid_step=getattr(args, "valid_step", 10 ** 9)),
        problems=[arch, classifier],
        dependencies={"u2l": {arch: [classifier]},
                      "l2u": {classifier: [arch]}},
    )
    engine.test_data = test_data
    return engine


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--channels", type=int, default=16)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.025)
    p.add_argument("--unroll_steps", type=int, default=1)
    p.add_argument("--lambda_j", type=float, default=0.1)
    p.add_argument("--lambda_c", type=float, default=0.01)
    p.add_argument("--train_size", type=int, default=1024)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--log_step", type=int, default=-1)
    p.add_argument("--valid_step", type=int, default=50)
    p.add_argument("--arch", default="darts", choices=["darts", "mlp"],
                   help="mlp = lightweight backbone for CI smoke runs")
    p.add_argument("--data-dir", dest="data_dir", type=str, default=None,
                   help="CIFAR-10 pickle dir or npz; synthetic if unset")
    args = p.parse_args()
    engine = build_engine(args)
    engine.run()
    print("genotype:", derive_genotype(engine.arch.params))
