"""MLPs, including the Meta-Weight-Net reweighter.

Counterpart of the reference's reweighting MLP (one hidden layer of 100
units, sigmoid output mapping per-example loss -> weight;
``examples/learning_to_reweight/main.py`` MWN definition and
``examples/imagenet_pruning/main.py:317-321`` two-input variant).
"""

from typing import Sequence

import flax.linen as nn


class MLP(nn.Module):
    features: Sequence[int]
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = getattr(nn, self.activation)
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1:
                x = act(x)
        return x


class MetaWeightNet(nn.Module):
    """loss value(s) -> per-example weight in (0, 1)."""

    hidden: int = 100
    in_features: int = 1

    @nn.compact
    def __call__(self, loss_values, train: bool = True):
        x = loss_values.reshape(-1, self.in_features)
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.Dense(1)(x)
        return nn.sigmoid(x).reshape(-1)
