"""Shared dataset ingestion for the vision examples.

This environment has no download egress, so every example trains on
synthetic data by default and ingests a real dataset when pointed at a
local copy with ``--data-dir``:

* CIFAR-10/100: torchvision pickle layout (``cifar-10-batches-py`` /
  ``cifar-100-python``) or an ``.npz`` with ``x_train/y_train/x_test/y_test``;
* generic classification npz: ``x_train/y_train/x_test/y_test`` arrays of
  any image shape (used by the ImageNet-pruning and domain examples);
* Omniglot-style npz: ``images (N,28,28[,1])`` + ``labels`` character ids.
"""

import os
import pickle

import numpy as np

CIFAR_MEAN = np.array([125.3, 123.0, 113.9], np.float32) / 255.0
CIFAR_STD = np.array([63.0, 62.1, 66.7], np.float32) / 255.0


def normalize_images(x, mean=CIFAR_MEAN, std=CIFAR_STD):
    x = np.asarray(x, np.float32)
    if x.max() > 2.0:  # uint8 range
        x = x / 255.0
    return (x - mean) / std


def _load_cifar_pickle_dir(path):
    def batch(name):
        with open(os.path.join(path, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        y = np.asarray(d.get(b"labels", d.get(b"fine_labels")), np.int32)
        return x, y

    if os.path.exists(os.path.join(path, "data_batch_1")):  # cifar10
        xs, ys = zip(*[batch(f"data_batch_{i}") for i in range(1, 6)])
        x_train, y_train = np.concatenate(xs), np.concatenate(ys)
        x_test, y_test = batch("test_batch")
    else:  # cifar100
        x_train, y_train = batch("train")
        x_test, y_test = batch("test")
    return x_train, y_train, x_test, y_test


def load_classification(data_dir, normalize=True):
    """(x_train, y_train, x_test, y_test) from an npz file or a CIFAR
    pickle directory; images float32 HWC (normalized when requested)."""
    if os.path.isfile(data_dir) and data_dir.endswith(".npz"):
        d = np.load(data_dir)
        x_train, y_train = d["x_train"], d["y_train"]
        x_test, y_test = d["x_test"], d["y_test"]
    else:
        for sub in ("cifar-10-batches-py", "cifar-100-python", ""):
            p = os.path.join(data_dir, sub) if sub else data_dir
            if os.path.exists(os.path.join(p, "data_batch_1")) or \
                    os.path.exists(os.path.join(p, "train")):
                x_train, y_train, x_test, y_test = _load_cifar_pickle_dir(p)
                break
        else:
            raise FileNotFoundError(f"no dataset found under {data_dir!r}")
    if normalize:
        x_train, x_test = normalize_images(x_train), normalize_images(x_test)
    else:
        x_train = np.asarray(x_train, np.float32)
        x_test = np.asarray(x_test, np.float32)
    return (x_train, np.asarray(y_train, np.int32),
            x_test, np.asarray(y_test, np.int32))


def load_omniglot(data_dir):
    """Omniglot-style npz: (images (N,28,28,1) float32 in [0,1] or uint8,
    labels (N,) int32 character ids)."""
    d = np.load(data_dir)
    x = np.asarray(d["images"], np.float32)
    if x.max() > 2.0:
        x = x / 255.0
    if x.ndim == 3:
        x = x[..., None]
    return x, np.asarray(d["labels"], np.int32)


def problem_accuracy(fwd, x, y, batch=256):
    """Batched eval accuracy through a problem's forward (``engine.<name>``),
    shared by the example engines' ``validation()`` implementations. The
    trailing partial batch is evaluated too (padded to the batch size so
    compiled shapes stay fixed) — dropping it would bias the metric and the
    best-checkpoint decisions that consume it."""
    import jax.numpy as jnp

    bs = min(batch, len(y))
    correct = 0
    for i in range(0, len(y), bs):
        xb, yb = x[i : i + bs], y[i : i + bs]
        k = len(yb)
        if k < bs:  # pad the tail to the steady batch shape
            pad = bs - k
            xb = np.concatenate([np.asarray(xb), np.asarray(x[:pad])])
        logits = fwd(jnp.asarray(xb))
        correct += int((np.asarray(logits)[:k].argmax(1) == yb).sum())
    return 100.0 * correct / max(len(y), 1)
