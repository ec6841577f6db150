"""Mixture-of-Experts with expert parallelism (Switch-style top-1 routing).

A TPU-first capability beyond the reference (no MoE anywhere upstream;
SURVEY.md §2.2 lists expert parallelism as absent). The design follows the
GShard/Switch dispatch pattern (arXiv:2006.16668, 2101.03961): routing is
expressed as dense one-hot dispatch/combine einsums — fully differentiable
(hypergradients flow through the router), static shapes, and the expert
dimension ``E`` of the expert weights is a plain sharding axis: place it on
an ``ep`` mesh axis (``Config(shard_rules=((r"moe.*/w[12]$", ("ep", None,
None)),))`` under ``strategy="tp"``) and GSPMD partitions per-expert
compute across devices with the dispatch all-to-alls inserted by the
partitioner.

Capacity semantics: each expert processes at most ``capacity`` tokens
(``capacity_factor * T / E``); overflow tokens bypass the FFN through the
residual connection (standard Switch behavior).
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp


def init_moe_params(rng, dim: int, hidden: int, num_experts: int):
    """Router + per-expert FFN weights. Expert weights carry a leading
    ``E`` axis — the expert-parallel sharding dimension."""
    k_g, k_1, k_2 = jax.random.split(rng, 3)
    s1 = 1.0 / math.sqrt(dim)
    s2 = 1.0 / math.sqrt(hidden)
    return {
        "router": s1 * jax.random.normal(k_g, (dim, num_experts)),
        "w1": s1 * jax.random.normal(k_1, (num_experts, dim, hidden)),
        "b1": jnp.zeros((num_experts, hidden)),
        "w2": s2 * jax.random.normal(k_2, (num_experts, hidden, dim)),
        "b2": jnp.zeros((num_experts, dim)),
    }


def moe_ffn(params, x, capacity_factor: float = 1.25,
            capacity: Optional[int] = None):
    """Switch top-1 MoE FFN over flattened tokens.

    ``x``: [T, d] tokens. Returns ``(y, aux)`` where ``y`` is [T, d]
    (gated expert outputs; capacity-dropped tokens contribute zero — add
    the residual outside) and ``aux`` is the Switch load-balancing loss
    (mean over experts of fraction_routed * mean_router_prob * E).
    """
    T, d = x.shape
    E = params["router"].shape[1]
    C = capacity if capacity is not None else max(
        1, int(math.ceil(capacity_factor * T / E))
    )

    logits = x @ params["router"]                      # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    expert_idx = jnp.argmax(probs, axis=-1)            # [T]
    gate = jnp.take_along_axis(probs, expert_idx[:, None], axis=1)[:, 0]

    # routing bookkeeping in fp32/int32 always: a bf16 cumsum represents
    # integers exactly only up to 256, so under Config(precision="bf16")
    # experts with >256 routed tokens would get colliding buffer positions
    # (silently blended outputs)
    onehot32 = jax.nn.one_hot(expert_idx, E, dtype=jnp.float32)    # [T, E]
    # position of each token within its expert's buffer (0-based)
    pos = jnp.cumsum(onehot32, axis=0) * onehot32 - onehot32       # [T, E]
    keep = ((pos < C) & (onehot32 > 0)).astype(x.dtype)
    pos_clipped = jnp.minimum(pos, C - 1).astype(jnp.int32)
    onehot = onehot32.astype(x.dtype)
    # dispatch tensor [T, E, C]
    dispatch = keep[:, :, None] * jax.nn.one_hot(
        pos_clipped, C, dtype=x.dtype
    )

    expert_in = jnp.einsum("tec,td->ecd", dispatch, x)             # [E, C, d]
    h = jax.nn.gelu(
        jnp.einsum("ecd,edh->ech", expert_in, params["w1"])
        + params["b1"][:, None, :]
    )
    expert_out = (
        jnp.einsum("ech,ehd->ecd", h, params["w2"])
        + params["b2"][:, None, :]
    )                                                              # [E, C, d]
    y = jnp.einsum("tec,ecd->td", dispatch, expert_out) * gate[:, None]

    # Switch aux loss: encourages uniform routing
    fraction = onehot.mean(axis=0)                                 # [E]
    mean_prob = probs.mean(axis=0)                                 # [E]
    aux = E * jnp.sum(fraction * mean_prob)
    return y, aux


def moe_ffn_dense(params, x):
    """Reference semantics without capacity (every token goes to its top-1
    expert, no drops): used for parity tests at capacity >= T."""
    return moe_ffn(params, x, capacity=x.shape[0])
