"""Experience buffer for RL workloads (actor/critic PPO).

The reference ships an empty placeholder (``betty/rl/buffer.py``, 0 LoC);
its PPO example streams rollouts through an example-local
``ExperienceSourceDataset`` instead (``examples/ppo/problems.py:45-221``).
Here the buffer is a first-class host-side component: rollouts accumulate as
numpy, and ``batches()`` yields stacked minibatches ready for device upload.
"""

from typing import Dict, Iterator, List

import numpy as np


class ExperienceBuffer:
    def __init__(self):
        self._data: Dict[str, List[np.ndarray]] = {}
        self._epoch = 0  # default shuffle stream for batches()

    def add(self, **fields):
        for key, value in fields.items():
            self._data.setdefault(key, []).append(np.asarray(value))

    def __len__(self):
        if not self._data:
            return 0
        return len(next(iter(self._data.values())))

    def stacked(self) -> Dict[str, np.ndarray]:
        return {k: np.stack(v) for k, v in self._data.items()}

    def clear(self):
        self._data = {}
        self._epoch = 0

    def batches(self, batch_size: int, shuffle=True, seed=None,
                drop_last=True) -> Iterator[Dict[str, np.ndarray]]:
        """seed=None (default) derives a fresh permutation per call
        (epoch counter), so repeated PPO epochs over the same buffer see
        different minibatch orders; pass a seed for reproducible order."""
        data = self.stacked()
        n = len(self)
        order = np.arange(n)
        if shuffle:
            if seed is None:
                seed = self._epoch
                self._epoch += 1
            np.random.RandomState(seed).shuffle(order)
        end = n - batch_size + 1 if drop_last else n
        for i in range(0, end, batch_size):
            idx = order[i : i + batch_size]
            yield {k: v[idx] for k, v in data.items()}
