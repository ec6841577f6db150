"""CIFAR ResNets (ResNet-32 for Meta-Weight-Net; WideResNet for NAS evals).

TPU-first design choices vs the reference's torch ResNet
(``examples/learning_to_reweight/resnet.py``): NHWC layout (XLA's native
conv layout on TPU), ``nn.BatchNorm`` with a mutable ``batch_stats``
collection, and all convs kept at MXU-friendly channel multiples.
"""

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5)
        conv = partial(nn.Conv, use_bias=False)
        residual = x
        y = conv(self.filters, (3, 3), (self.strides, self.strides))(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3))(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1),
                            (self.strides, self.strides))(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Pre-2015-style CIFAR ResNet: 3 stages of n blocks, widths 16/32/64."""

    stage_sizes: Sequence[int] = (5, 5, 5)  # ResNet-32: 6n+2 with n=5
    num_classes: int = 10
    width: int = 16

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5)
        x = nn.Conv(self.width, (3, 3), use_bias=False)(x)
        x = norm()(x)
        x = nn.relu(x)
        for stage, n_blocks in enumerate(self.stage_sizes):
            filters = self.width * (2 ** stage)
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(filters, strides)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


def ResNet32(num_classes: int = 10) -> ResNet:
    return ResNet(stage_sizes=(5, 5, 5), num_classes=num_classes)


class BottleneckBlock(nn.Module):
    filters: int  # bottleneck width; output is 4x
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5)
        conv = partial(nn.Conv, use_bias=False)
        residual = x
        y = nn.relu(norm()(conv(self.filters, (1, 1))(x)))
        y = nn.relu(norm()(conv(self.filters, (3, 3),
                                (self.strides, self.strides))(y)))
        y = norm(scale_init=nn.initializers.zeros)(
            conv(self.filters * 4, (1, 1))(y))
        if residual.shape != y.shape:
            residual = norm()(conv(self.filters * 4, (1, 1),
                                   (self.strides, self.strides))(residual))
        return nn.relu(y + residual)


class ResNetV1(nn.Module):
    """ImageNet-style ResNet with bottleneck blocks (ResNet-50/101/152)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    num_classes: int = 1000
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.width, (7, 7), (2, 2), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, n_blocks in enumerate(self.stage_sizes):
            filters = self.width * (2 ** stage)
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BottleneckBlock(filters, strides)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


def ResNet50(num_classes: int = 1000) -> ResNetV1:
    return ResNetV1(stage_sizes=(3, 4, 6, 3), num_classes=num_classes)


class WideResNet(nn.Module):
    """WRN-d-k for robust-NAS style evaluations."""

    depth: int = 28
    widen: int = 2
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = (self.depth - 4) // 6
        widths = [16, 16 * self.widen, 32 * self.widen, 64 * self.widen]
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5)
        x = nn.Conv(widths[0], (3, 3), use_bias=False)(x)
        for stage in range(3):
            for block in range(n):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(widths[stage + 1], strides)(x, train=train)
        x = norm()(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)
