"""Host-side data loading utilities.

TPU-native counterpart of reference ``betty/patch/data_loader.py``: instead
of wrapping torch DataLoaders in a rank-aware batch sampler, betty_tpu
problems accept any iterable; these helpers provide

* :class:`ArrayLoader` — epoch-seeded shuffled minibatches over in-memory
  arrays (deterministic across hosts given the seed, the property the
  reference's ``DistributedDataLoader`` epoch-seeded generator provides);
* :func:`shard_loader` — per-host example sharding for multi-host meshes
  (each process loads its slice; combine with
  ``betty_tpu.parallel.make_global_batch``);
* :func:`prefetch_to_device` — a double-buffered iterator that overlaps
  host->device transfer with device compute.
"""

import collections
import itertools
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


class ArrayLoader:
    """Shuffled minibatches over array pytrees with epoch-seeded RNG.

    ``set_epoch`` (called automatically by ``Problem.get_batch_single_loader``
    on epoch rollover) reseeds the shuffle, matching the reference's
    ``DistributedDataLoader.set_epoch`` semantics."""

    def __init__(self, *arrays, batch_size: int, seed: int = 0,
                 drop_last: bool = True, shuffle: bool = True,
                 device: bool = False):
        assert arrays, "ArrayLoader needs at least one array"
        n = len(arrays[0])
        assert all(len(a) == n for a in arrays)
        if device:
            # dataset-resident-on-HBM mode: one upfront transfer, per-batch
            # slicing happens as device gathers. The fast path on proxied /
            # tunneled TPU runtimes where recurring host->device transfers
            # are expensive (and a good pattern for any dataset that fits).
            # Arrays that are ALREADY on device (e.g. generated there) must
            # not round-trip through np.asarray — on the ~MB/s tunneled
            # runtime that download would cost minutes for a GB dataset.
            arrays = tuple(
                a if isinstance(a, jax.Array)
                else jax.device_put(np.asarray(a))
                for a in arrays
            )
        self.arrays = arrays
        self.device = device
        self.n = n
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def _epoch_order(self, epoch):
        if self.shuffle:
            return np.random.RandomState(self.seed + epoch).permutation(self.n)
        return np.arange(self.n)

    def postprocess(self, batch):
        """Hook for subclasses (augmentation, tokenization, ...). Applied on
        EVERY host-side batch path — ``__iter__`` and the mid-epoch
        ``iter_from`` resume — so overriding this (rather than ``__iter__``)
        keeps custom batch logic across checkpoints and multi-host sharding.
        Loaders overriding it are excluded from the compiled-block in-device
        gather fast path (the gathers bypass host code)."""
        return batch

    def __iter__(self):
        order = self._epoch_order(self.epoch)
        end = self.n - self.batch_size + 1 if self.drop_last else self.n
        for i in range(0, end, self.batch_size):
            idx = order[i : i + self.batch_size]
            batch = tuple(a[idx] for a in self.arrays)
            yield self.postprocess(batch[0] if len(batch) == 1 else batch)

    def take_indices(self, count: int) -> np.ndarray:
        """Fast-path API for the compiled-block runner: advance by ``count``
        batches and return their index rows, shape (count, batch_size).
        Follows the same epoch-rollover/order sequence as iterating with
        ``set_epoch(epoch+1)`` on exhaustion (Problem.get_batch semantics).

        The cursor is shared with driver-mode iteration via ``sync_cursor``
        (driver -> fastpath, called by the block runner before its first
        block) and ``cursor_position``/``iter_from`` (fastpath -> driver,
        called after each block) so warmup/remainder driver iterations and
        compiled blocks consume one continuous batch stream with no
        re-served data."""
        assert self.drop_last, "take_indices requires drop_last"
        out = []
        pos = getattr(self, "_fp_pos", None)
        order = getattr(self, "_fp_order", None)
        epoch = getattr(self, "_fp_epoch", self.epoch)
        while len(out) < count:
            if order is None or pos + self.batch_size > self.n:
                if order is not None:
                    epoch += 1
                order = self._epoch_order(epoch)
                pos = 0
            out.append(order[pos : pos + self.batch_size])
            pos += self.batch_size
        self._fp_pos, self._fp_order, self._fp_epoch = pos, order, epoch
        return np.stack(out).astype(np.int32)

    def sync_cursor(self, epoch: int, batches_served: int):
        """Align the ``take_indices`` cursor with a driver iterator that has
        already consumed ``batches_served`` batches of ``epoch``."""
        self._fp_epoch = int(epoch)
        self._fp_order = self._epoch_order(int(epoch))
        self._fp_pos = int(batches_served) * self.batch_size

    def cursor_position(self):
        """(epoch, batches_served) of the ``take_indices`` cursor."""
        pos = getattr(self, "_fp_pos", 0)
        epoch = getattr(self, "_fp_epoch", self.epoch)
        return int(epoch), int(pos // self.batch_size)

    def iter_from(self, epoch: int, batches_served: int):
        """Iterator over the remainder of ``epoch`` starting after
        ``batches_served`` batches (driver-mode resume after compiled
        blocks; the loader's normal ``__iter__`` restart-the-epoch semantics
        are unchanged)."""
        order = self._epoch_order(int(epoch))
        end = self.n - self.batch_size + 1 if self.drop_last else self.n
        for i in range(int(batches_served) * self.batch_size, end,
                       self.batch_size):
            idx = order[i : i + self.batch_size]
            batch = tuple(a[idx] for a in self.arrays)
            yield self.postprocess(batch[0] if len(batch) == 1 else batch)


def shard_loader(loader: ArrayLoader, process_index: Optional[int] = None,
                 process_count: Optional[int] = None) -> ArrayLoader:
    """Per-host example sharding: process i keeps examples i::N
    (counterpart of the reference's rank-round-robin
    ``DistributedBatchSampler``, ``betty/patch/data_loader.py:7-61``)."""
    import copy

    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    arrays = tuple(
        np.asarray(a)[process_index::process_count] for a in loader.arrays
    )
    if loader.device:
        arrays = tuple(jax.device_put(a) for a in arrays)
    # shallow-copy so ArrayLoader SUBCLASSES (custom postprocess/attrs)
    # survive the per-host resharding, then swap in the shard
    new = copy.copy(loader)
    new.arrays = arrays
    new.n = len(arrays[0])
    new.epoch = 0
    for attr in ("_fp_pos", "_fp_order", "_fp_epoch"):
        if hasattr(new, attr):
            delattr(new, attr)
    return new


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Double-buffered device prefetch: keeps ``size`` batches in flight so
    host->device transfer overlaps device compute (jax transfers are async;
    this just keeps the pipeline primed)."""

    queue = collections.deque()

    def put(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding) if sharding is not None
            else jax.device_put(x),
            batch,
        )

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        queue.append(put(batch))
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
