"""Shared pieces for the tutorial series: an imbalanced MNIST-shaped
reweighting task (synthetic by default — swap in torchvision MNIST via
--data-dir when available), mirroring reference ``tutorial/*.py``."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import ImplicitProblem
from betty_tpu.models import MLP
from betty_tpu.module import from_flax


# class prototypes FIXED across splits: train/meta/test must be draws from
# the SAME task or the bilevel demo (and its validation accuracy) is
# meaningless
_PROTOS = np.random.RandomState(12345).randn(2, 784)


def make_imbalanced_mnist(n=2048, imbalance=20, seed=0):
    """Synthetic 28x28 two-class data with heavy class imbalance. ``seed``
    varies the examples and imbalance draw, not the underlying task."""
    rng = np.random.RandomState(seed)
    n_minor = n // (imbalance + 1)
    y = np.concatenate([np.ones(n_minor), np.zeros(n - n_minor)])
    rng.shuffle(y)
    x = _PROTOS[y.astype(int)] + rng.randn(n, 784)
    return x.astype(np.float32), y.astype(np.int32)


from betty_tpu.data import ArrayLoader


class Loader(ArrayLoader):
    def __init__(self, x, y, batch_size, seed=0, device=False):
        super().__init__(x, y, batch_size=batch_size, seed=seed,
                         device=device)


class Reweight(ImplicitProblem):
    """Upper level: learn per-example weights from balanced meta data."""

    def training_step(self, batch):
        inputs, labels = batch
        outputs = self.classifier(inputs)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            outputs, labels
        ).mean()
        acc = (outputs.argmax(axis=1) == labels).mean() * 100
        return {"loss": loss, "acc": acc}


class Classifier(ImplicitProblem):
    """Lower level: classifier with meta-learned example weights."""

    def training_step(self, batch):
        inputs, labels = batch
        outputs = self.module(inputs)
        ce = optax.softmax_cross_entropy_with_integer_labels(outputs, labels)
        weights = self.reweight(jax.lax.stop_gradient(ce)[:, None]).squeeze(-1)
        weights = jax.nn.sigmoid(weights)
        return jnp.mean(weights * ce)


def classifier_module(batch_size, rng_seed=0):
    return from_flax(MLP(features=[128, 2]),
                     jnp.zeros((batch_size, 784)),
                     rng=jax.random.PRNGKey(rng_seed))


def reweight_module(batch_size, rng_seed=1):
    return from_flax(MLP(features=[100, 1]),
                     jnp.zeros((batch_size, 1)),
                     rng=jax.random.PRNGKey(rng_seed))
