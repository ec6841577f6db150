"""Omniglot few-shot CNN (iMAML backbone, reference
``examples/implicit_maml/`` 4-conv architecture)."""

from functools import partial

import flax.linen as nn


class OmniglotCNN(nn.Module):
    num_classes: int = 5
    hidden: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5)
        for _ in range(4):
            x = nn.Conv(self.hidden, (3, 3), use_bias=True)(x)
            x = norm()(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes)(x)
