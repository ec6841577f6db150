"""DARTS search space: supernet with architecture-weighted mixed ops.

Capability counterpart of reference
``examples/neural_architecture_search/model_search.py`` (cells of 4
intermediate nodes, 14 edges, 8 candidate ops, softmaxed alphas) —
re-designed for TPU: architecture parameters are *inputs* to the supernet
apply function (not module attributes), so the bilevel arch <- classifier
coupling is an ordinary differentiable function argument; every candidate op
runs batched and the mixture is one weighted sum XLA fuses, with no dynamic
control flow.
"""

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PRIMITIVES = (
    "none",
    "max_pool_3x3",
    "avg_pool_3x3",
    "skip_connect",
    "sep_conv_3x3",
    "sep_conv_5x5",
    "dil_conv_3x3",
    "dil_conv_5x5",
)

NUM_NODES = 4  # intermediate nodes per cell
NUM_EDGES = sum(2 + i for i in range(NUM_NODES))  # 14


def num_alphas():
    return NUM_EDGES, len(PRIMITIVES)


class ReLUConvBN(nn.Module):
    filters: int
    kernel: int = 1
    strides: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.relu(x)
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    (self.strides, self.strides), use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)


class SepConv(nn.Module):
    filters: int
    kernel: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9)
        c_in = x.shape[-1]
        for rep, s in ((0, self.strides), (1, 1)):
            x = nn.relu(x)
            x = nn.Conv(c_in, (self.kernel, self.kernel), (s, s),
                        feature_group_count=c_in, use_bias=False)(x)
            x = nn.Conv(self.filters if rep == 1 else c_in, (1, 1),
                        use_bias=False)(x)
            x = norm()(x)
        return x


class DilConv(nn.Module):
    filters: int
    kernel: int
    strides: int = 1
    dilation: int = 2

    @nn.compact
    def __call__(self, x, train=True):
        c_in = x.shape[-1]
        x = nn.relu(x)
        x = nn.Conv(c_in, (self.kernel, self.kernel),
                    (self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=c_in, use_bias=False)(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)


class FactorizedReduce(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.relu(x)
        a = nn.Conv(self.filters // 2, (1, 1), (2, 2), use_bias=False)(x)
        b = nn.Conv(self.filters // 2, (1, 1), (2, 2),
                    use_bias=False)(x[:, 1:, 1:, :])
        b = jnp.pad(b, ((0, 0), (0, a.shape[1] - b.shape[1]),
                        (0, a.shape[2] - b.shape[2]), (0, 0)))
        x = jnp.concatenate([a, b], axis=-1)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)


def _pool(x, kind, strides):
    window = (3, 3)
    s = (strides, strides)
    if kind == "max":
        return nn.max_pool(x, window, strides=s, padding="SAME")
    return nn.avg_pool(x, window, strides=s, padding="SAME")


class MixedOp(nn.Module):
    filters: int
    strides: int

    @nn.compact
    def __call__(self, x, weights, train=True):
        outs = []
        for prim in PRIMITIVES:
            if prim == "none":
                if self.strides == 1:
                    o = jnp.zeros_like(x)
                else:
                    o = jnp.zeros(
                        (x.shape[0], x.shape[1] // self.strides,
                         x.shape[2] // self.strides, self.filters),
                        x.dtype,
                    )
            elif prim in ("max_pool_3x3", "avg_pool_3x3"):
                o = _pool(x, prim.split("_")[0], self.strides)
                o = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9)(o)
            elif prim == "skip_connect":
                o = (x if self.strides == 1
                     else FactorizedReduce(self.filters)(x, train=train))
            elif prim == "sep_conv_3x3":
                o = SepConv(self.filters, 3, self.strides)(x, train=train)
            elif prim == "sep_conv_5x5":
                o = SepConv(self.filters, 5, self.strides)(x, train=train)
            elif prim == "dil_conv_3x3":
                o = DilConv(self.filters, 3, self.strides)(x, train=train)
            elif prim == "dil_conv_5x5":
                o = DilConv(self.filters, 5, self.strides)(x, train=train)
            outs.append(o)
        stacked = jnp.stack(outs, axis=0)  # (P, B, H, W, C)
        return jnp.einsum("p,pbhwc->bhwc", weights, stacked)


class Cell(nn.Module):
    filters: int
    reduction: bool
    reduction_prev: bool

    @nn.compact
    def __call__(self, s0, s1, weights, train=True):
        # weights: (NUM_EDGES, P) softmaxed alphas for this cell type
        if self.reduction_prev:
            s0 = FactorizedReduce(self.filters)(s0, train=train)
        else:
            s0 = ReLUConvBN(self.filters)(s0, train=train)
        s1 = ReLUConvBN(self.filters)(s1, train=train)

        states = [s0, s1]
        offset = 0
        for i in range(NUM_NODES):
            acc = None
            for j, h in enumerate(states):
                strides = 2 if self.reduction and j < 2 else 1
                o = MixedOp(self.filters, strides)(
                    h, weights[offset + j], train=train
                )
                acc = o if acc is None else acc + o
            offset += len(states)
            states.append(acc)
        return jnp.concatenate(states[-NUM_NODES:], axis=-1)


class DARTSNetwork(nn.Module):
    """The searchable supernet. ``alphas`` = dict with "normal" and "reduce"
    logits of shape (NUM_EDGES, len(PRIMITIVES)); softmax happens inside so
    the arch problem holds raw logits (like the reference's alphas)."""

    channels: int = 16
    layers: int = 8
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, alphas, train: bool = True):
        w_normal = jax.nn.softmax(alphas["normal"], axis=-1)
        w_reduce = jax.nn.softmax(alphas["reduce"], axis=-1)

        c_curr = 3 * self.channels
        x = nn.Conv(c_curr, (3, 3), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        s0 = s1 = x

        c = self.channels
        reduction_prev = False
        for i in range(self.layers):
            reduction = i in (self.layers // 3, 2 * self.layers // 3)
            if reduction:
                c *= 2
            cell = Cell(c, reduction, reduction_prev)
            s0, s1 = s1, cell(
                s0, s1, w_reduce if reduction else w_normal, train=train
            )
            reduction_prev = reduction

        out = jnp.mean(s1, axis=(1, 2))
        return nn.Dense(self.num_classes)(out)


def init_alphas(rng=None, scale=1e-3):
    """Architecture logits (the arch problem's parameters)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    E, P = num_alphas()
    return {
        "normal": scale * jax.random.normal(k1, (E, P)),
        "reduce": scale * jax.random.normal(k2, (E, P)),
    }


class Genotype(NamedTuple):
    normal: Tuple
    normal_concat: Sequence[int]
    reduce: Tuple
    reduce_concat: Sequence[int]


def derive_genotype(alphas) -> Genotype:
    """Discrete architecture extraction — same rule as the reference
    (top-2 incoming edges per node by strongest non-'none' op)."""

    def parse(logits):
        w = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        w = np.asarray(w)
        gene = []
        offset = 0
        none_idx = PRIMITIVES.index("none")
        for i in range(NUM_NODES):
            n_in = 2 + i
            edges = w[offset : offset + n_in]
            strength = np.max(
                np.delete(edges, none_idx, axis=1), axis=1
            )
            top2 = np.argsort(-strength)[:2]
            for j in sorted(top2):
                ops = np.delete(edges[j], none_idx)
                names = [p for p in PRIMITIVES if p != "none"]
                gene.append((names[int(np.argmax(ops))], int(j)))
            offset += n_in
        return tuple(gene)

    concat = tuple(range(2, 2 + NUM_NODES))
    return Genotype(
        normal=parse(alphas["normal"]),
        normal_concat=concat,
        reduce=parse(alphas["reduce"]),
        reduce_concat=concat,
    )
