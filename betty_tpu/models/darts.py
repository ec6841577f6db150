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
    affine: bool = True  # search phase uses affine=False (reference
    # model_search.py: BN scales must not absorb the architecture weights)

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.relu(x)
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    (self.strides, self.strides), use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            use_scale=self.affine, use_bias=self.affine)(x)


class SepConv(nn.Module):
    filters: int
    kernel: int
    strides: int = 1
    affine: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, use_scale=self.affine,
                       use_bias=self.affine)
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
    affine: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        c_in = x.shape[-1]
        x = nn.relu(x)
        x = nn.Conv(c_in, (self.kernel, self.kernel),
                    (self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=c_in, use_bias=False)(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            use_scale=self.affine, use_bias=self.affine)(x)


class FactorizedReduce(nn.Module):
    filters: int
    affine: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.relu(x)
        a = nn.Conv(self.filters // 2, (1, 1), (2, 2), use_bias=False)(x)
        b = nn.Conv(self.filters // 2, (1, 1), (2, 2),
                    use_bias=False)(x[:, 1:, 1:, :])
        b = jnp.pad(b, ((0, 0), (0, a.shape[1] - b.shape[1]),
                        (0, a.shape[2] - b.shape[2]), (0, 0)))
        x = jnp.concatenate([a, b], axis=-1)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            use_scale=self.affine, use_bias=self.affine)(x)


def _pool(x, kind, strides):
    window = (3, 3)
    s = (strides, strides)
    if kind == "max":
        return nn.max_pool(x, window, strides=s, padding="SAME")
    return nn.avg_pool(x, window, strides=s, padding="SAME")


class MixedOp(nn.Module):
    filters: int
    strides: int
    # reference model_search.py builds every candidate op with affine=False
    affine: bool = False

    @nn.compact
    def __call__(self, x, weights, train=True):
        af = self.affine
        outs = []
        for prim in PRIMITIVES:
            if prim == "none":
                if self.strides == 1:
                    o = jnp.zeros_like(x)
                else:
                    # ceil division: the other stride-2 ops use SAME padding
                    o = jnp.zeros(
                        (x.shape[0], -(-x.shape[1] // self.strides),
                         -(-x.shape[2] // self.strides), self.filters),
                        x.dtype,
                    )
            elif prim in ("max_pool_3x3", "avg_pool_3x3"):
                o = _pool(x, prim.split("_")[0], self.strides)
                o = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, use_scale=af,
                                 use_bias=af)(o)
            elif prim == "skip_connect":
                o = (x if self.strides == 1
                     else FactorizedReduce(self.filters,
                                           affine=af)(x, train=train))
            elif prim == "sep_conv_3x3":
                o = SepConv(self.filters, 3, self.strides,
                            affine=af)(x, train=train)
            elif prim == "sep_conv_5x5":
                o = SepConv(self.filters, 5, self.strides,
                            affine=af)(x, train=train)
            elif prim == "dil_conv_3x3":
                o = DilConv(self.filters, 3, self.strides,
                            affine=af)(x, train=train)
            elif prim == "dil_conv_5x5":
                o = DilConv(self.filters, 5, self.strides,
                            affine=af)(x, train=train)
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
            s0 = FactorizedReduce(self.filters, affine=False)(s0, train=train)
        else:
            s0 = ReLUConvBN(self.filters, affine=False)(s0, train=train)
        s1 = ReLUConvBN(self.filters, affine=False)(s1, train=train)

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


def genotype_to_json(genotype: "Genotype") -> str:
    """Serialize a genotype for the search → evaluation handoff (the
    reference passes genotypes between ``train_search.py`` and ``train.py``
    as Python literals in ``genotypes.py``; here it's a JSON file)."""
    import json

    return json.dumps({
        "normal": [list(e) for e in genotype.normal],
        "normal_concat": list(genotype.normal_concat),
        "reduce": [list(e) for e in genotype.reduce],
        "reduce_concat": list(genotype.reduce_concat),
    })


def genotype_from_json(text: str) -> Genotype:
    import json

    d = json.loads(text)
    return Genotype(
        normal=tuple((str(n), int(i)) for n, i in d["normal"]),
        normal_concat=tuple(d["normal_concat"]),
        reduce=tuple((str(n), int(i)) for n, i in d["reduce"]),
        reduce_concat=tuple(d["reduce_concat"]),
    )


# DARTS_V2 from the reference's published genotypes
# (examples/neural_architecture_search/genotypes.py) — the stock
# architecture for the evaluation phase when no search result is supplied.
DARTS_V2 = Genotype(
    normal=(("sep_conv_3x3", 0), ("sep_conv_3x3", 1), ("sep_conv_3x3", 0),
            ("sep_conv_3x3", 1), ("sep_conv_3x3", 1), ("skip_connect", 0),
            ("skip_connect", 0), ("dil_conv_3x3", 2)),
    normal_concat=(2, 3, 4, 5),
    reduce=(("max_pool_3x3", 0), ("max_pool_3x3", 1), ("skip_connect", 2),
            ("max_pool_3x3", 1), ("max_pool_3x3", 0), ("skip_connect", 2),
            ("skip_connect", 2), ("max_pool_3x3", 1)),
    reduce_concat=(2, 3, 4, 5),
)


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


# ---------------------------------------------------------------------------
# Evaluation phase: discrete-genotype network (reference
# ``examples/neural_architecture_search/model.py`` — ``Cell``/
# ``AuxiliaryHeadCIFAR``/``NetworkCIFAR`` — and ``utils.drop_path``).
# The searched cell is compiled to a fixed op list; drop-path is per-sample
# stochastic depth on non-identity edges; the auxiliary head taps the
# 2/3-depth cell during training.
# ---------------------------------------------------------------------------


def drop_path(x, drop_prob, rng):
    """Per-sample stochastic depth (reference ``utils.drop_path``): zero a
    sample's whole edge output with probability ``drop_prob`` and rescale
    survivors by 1/keep. ``drop_prob`` may be a traced scalar (the schedule
    ramps it per epoch without recompiling)."""
    keep = 1.0 - drop_prob
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
    return x * mask.astype(x.dtype) / jnp.maximum(keep, 1e-8)


def _discrete_op(name, filters, strides):
    """Op factory for compiled cells. Unlike the supernet's MixedOp, pooling
    has no trailing BatchNorm (the reference adds BN to pooling only inside
    the search-phase MixedOp, not in the discrete ``OPS``)."""
    if name == "skip_connect":
        if strides == 1:
            return None  # identity; also exempt from drop-path
        return FactorizedReduce(filters)
    if name in ("max_pool_3x3", "avg_pool_3x3"):
        kind = name.split("_")[0]
        return partial(_pool, kind=kind, strides=strides)
    if name == "sep_conv_3x3":
        return SepConv(filters, 3, strides)
    if name == "sep_conv_5x5":
        return SepConv(filters, 5, strides)
    if name == "dil_conv_3x3":
        return DilConv(filters, 3, strides)
    if name == "dil_conv_5x5":
        return DilConv(filters, 5, strides)
    raise ValueError(f"op {name!r} cannot appear in a discrete genotype")


class DiscreteCell(nn.Module):
    """One compiled cell of the evaluation network (reference ``model.py``
    ``Cell``): each intermediate node sums two genotype-selected edges."""

    genotype: Genotype
    filters: int
    reduction: bool
    reduction_prev: bool

    @nn.compact
    def __call__(self, s0, s1, drop_prob=0.0, train=True):
        if self.reduction_prev:
            s0 = FactorizedReduce(self.filters)(s0, train=train)
        else:
            s0 = ReLUConvBN(self.filters)(s0, train=train)
        s1 = ReLUConvBN(self.filters)(s1, train=train)

        gene = self.genotype.reduce if self.reduction else self.genotype.normal
        concat = (self.genotype.reduce_concat if self.reduction
                  else self.genotype.normal_concat)

        # skip the rng draw entirely only when the prob is a static 0
        use_dp = train and (
            not isinstance(drop_prob, (int, float)) or drop_prob > 0.0
        )
        states = [s0, s1]
        for i in range(len(gene) // 2):
            hs = []
            for name, idx in gene[2 * i : 2 * i + 2]:
                strides = 2 if self.reduction and idx < 2 else 1
                op = _discrete_op(name, self.filters, strides)
                h = states[idx]
                if op is None:
                    hs.append(h)  # identity, no drop-path
                    continue
                if isinstance(op, partial):
                    h = op(h)
                else:
                    h = op(h, train=train)
                if use_dp:
                    h = drop_path(h, drop_prob, self.make_rng("droppath"))
                hs.append(h)
            states.append(hs[0] + hs[1])
        return jnp.concatenate([states[i] for i in concat], axis=-1)


class AuxiliaryHeadCIFAR(nn.Module):
    """Reference ``model.py:87-109``: input is the 8x8 feature map of the
    2/3-depth cell; 5x5/3 avg-pool to 2x2, 1x1→128, 2x2→768, linear."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.relu(x)
        x = nn.avg_pool(x, (5, 5), strides=(3, 3), padding="VALID")
        x = nn.Conv(128, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(768, (2, 2), padding="VALID", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes)(x.reshape(x.shape[0], -1))


class DARTSEvalNetwork(nn.Module):
    """Evaluation-phase network (reference ``NetworkCIFAR``): stem → stack of
    discrete cells (channels double at 1/3 and 2/3 depth) → global pool →
    classifier, with an optional auxiliary classifier at the 2/3 cell.

    Returns ``(logits, aux_logits_or_None)``. ``drop_path_prob`` is an apply
    argument (traced scalar) so the per-epoch schedule never recompiles;
    drop-path draws from the ``"droppath"`` rng collection."""

    genotype: Genotype
    channels: int = 36
    layers: int = 20
    num_classes: int = 10
    auxiliary: bool = True

    @nn.compact
    def __call__(self, x, drop_path_prob=0.0, train: bool = True):
        c_curr = 3 * self.channels
        x = nn.Conv(c_curr, (3, 3), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        s0 = s1 = x

        aux_logits = None
        c = self.channels
        reduction_prev = False
        for i in range(self.layers):
            reduction = i in (self.layers // 3, 2 * self.layers // 3)
            if reduction:
                c *= 2
            cell = DiscreteCell(self.genotype, c, reduction, reduction_prev)
            s0, s1 = s1, cell(s0, s1, drop_path_prob, train=train)
            reduction_prev = reduction
            if i == 2 * self.layers // 3 and self.auxiliary and train:
                aux_logits = AuxiliaryHeadCIFAR(self.num_classes)(
                    s1, train=train
                )

        out = jnp.mean(s1, axis=(1, 2))
        logits = nn.Dense(self.num_classes)(out)
        return logits, aux_logits
