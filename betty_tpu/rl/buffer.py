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

    def batches(self, batch_size: int, shuffle=True, seed=0,
                drop_last=True) -> Iterator[Dict[str, np.ndarray]]:
        data = self.stacked()
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        end = n - batch_size + 1 if drop_last else n
        for i in range(0, end, batch_size):
            idx = order[i : i + batch_size]
            yield {k: v[idx] for k, v in data.items()}
