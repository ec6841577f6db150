"""Data utilities: epoch-seeded shuffling, per-host sharding, prefetch."""

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
