"""Data utilities: epoch-seeded shuffling, per-host sharding, prefetch."""

import jax.numpy as jnp
import numpy as np

from betty_tpu.data import ArrayLoader, prefetch_to_device, shard_loader


def test_array_loader_epoch_seeding():
    x = np.arange(100)
    loader = ArrayLoader(x, batch_size=10, seed=3)
    e0_a = [np.asarray(b) for b in loader]
    e0_b = [np.asarray(b) for b in loader]
    assert all(np.array_equal(a, b) for a, b in zip(e0_a, e0_b))
    loader.set_epoch(1)
    e1 = [np.asarray(b) for b in loader]
    assert not all(np.array_equal(a, b) for a, b in zip(e0_a, e1))
    assert sorted(np.concatenate(e1).tolist()) == list(range(100))


def test_array_loader_multi_arrays_and_len():
    x = np.arange(25)
    y = np.arange(25) * 2
    loader = ArrayLoader(x, y, batch_size=10, drop_last=True)
    assert len(loader) == 2
    for xb, yb in loader:
        assert np.array_equal(yb, xb * 2)


def test_shard_loader():
    x = np.arange(32)
    loader = ArrayLoader(x, batch_size=4, shuffle=False)
    shard0 = shard_loader(loader, process_index=0, process_count=4)
    shard1 = shard_loader(loader, process_index=1, process_count=4)
    assert np.array_equal(shard0.arrays[0], np.arange(0, 32, 4))
    assert np.array_equal(shard1.arrays[0], np.arange(1, 32, 4))


def test_prefetch_to_device():
    x = np.arange(40).reshape(10, 4).astype(np.float32)
    loader = ArrayLoader(x, batch_size=2, shuffle=False)
    batches = list(prefetch_to_device(loader, size=3))
    assert len(batches) == 5
    assert np.array_equal(np.asarray(batches[0]), x[:2])


# ---------------------------------------------------------------------------
# device-side augmentation (betty_tpu/data/augment.py) — the TPU-native
# counterpart of reference examples/imagenet_pruning/dataset.py:35-56
# ---------------------------------------------------------------------------


def test_random_resized_crop_shapes_and_jit():
    import jax

    from betty_tpu.data import random_resized_crop

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(4, 64, 48, 3).astype(np.float32))
    out = jax.jit(lambda x, k: random_resized_crop(x, k, 32))(
        imgs, jax.random.PRNGKey(0))
    assert out.shape == (4, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    # values come from interpolating [0,1) inputs — must stay in range
    assert float(out.min()) >= -1e-3 and float(out.max()) <= 1.0 + 1e-3
    # different keys -> different crops; same key -> identical (pure fn)
    out2 = random_resized_crop(imgs, jax.random.PRNGKey(1), 32)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-3
    out3 = random_resized_crop(imgs, jax.random.PRNGKey(0), 32)
    # jit vs eager float epsilon only
    assert float(jnp.max(jnp.abs(out - out3))) < 1e-5


def test_full_area_crop_is_resize():
    """With scale pinned to 1.0 and ratio pinned to the image's own aspect,
    the crop box is the whole image — the op must reduce to a plain
    resize."""
    import jax

    from betty_tpu.data import random_resized_crop

    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(2, 40, 40, 3).astype(np.float32))
    out = random_resized_crop(imgs, jax.random.PRNGKey(0), 20,
                              scale=(1.0, 1.0), ratio=(1.0, 1.0))
    ref = jax.vmap(lambda im: jax.image.resize(
        im, (20, 20, 3), method="linear"))(imgs)
    # scale_and_translate(antialias) == resize(linear) for the same box
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_random_horizontal_flip_semantics():
    import jax

    from betty_tpu.data import random_horizontal_flip

    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.rand(64, 8, 8, 3).astype(np.float32))
    out = random_horizontal_flip(imgs, jax.random.PRNGKey(0))
    flipped = np.asarray(
        jnp.all(jnp.abs(out - imgs[:, :, ::-1, :]) < 1e-7, axis=(1, 2, 3)))
    kept = np.asarray(jnp.all(jnp.abs(out - imgs) < 1e-7, axis=(1, 2, 3)))
    assert np.all(flipped | kept)
    # p=0.5 over 64 images: both outcomes occur
    assert flipped.sum() > 0 and kept.sum() > 0
    assert np.array_equal(
        np.asarray(random_horizontal_flip(imgs, jax.random.PRNGKey(0), p=0.0)),
        np.asarray(imgs))


def test_center_crop_resize_centered():
    """A centered bright square must stay centered and fill the expected
    fraction after Resize+CenterCrop."""
    from betty_tpu.data import center_crop_resize

    img = np.zeros((1, 100, 80, 1), np.float32)
    img[0, 40:60, 30:50, 0] = 1.0  # centered 20x20 square
    out = np.asarray(center_crop_resize(jnp.asarray(img), 32))
    # center pixel bright, corners dark
    assert out[0, 16, 16, 0] > 0.9
    assert out[0, 1, 1, 0] < 0.1 and out[0, 30, 30, 0] < 0.1


def test_imagenet_transforms_compose():
    import jax

    from betty_tpu.data import (
        IMAGENET_MEAN,
        imagenet_eval_transform,
        imagenet_train_transform,
    )

    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    tr = jax.jit(lambda x, k: imagenet_train_transform(x, k, out_size=32))(
        imgs, jax.random.PRNGKey(0))
    ev = jax.jit(lambda x: imagenet_eval_transform(x, out_size=32))(imgs)
    assert tr.shape == ev.shape == (2, 32, 32, 3)
    # normalized: uniform [0,1] inputs land roughly at (0.5-mean)/std
    m = np.asarray(ev).mean(axis=(0, 1, 2))
    expected = (0.5 - np.asarray(IMAGENET_MEAN)) / np.asarray(
        (0.229, 0.224, 0.225))
    assert np.allclose(m, expected, atol=0.2)
