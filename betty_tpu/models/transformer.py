"""Transformer encoder classifier (RoBERTa-style) for SAMA data reweighting.

Capability counterpart of the reference's use of HF roberta-large in
``examples/bert_data_reweighting/main.py``. TPU-first design: bf16-friendly
einsum attention (MXU-shaped heads), fused residual blocks left to XLA,
static sequence lengths, mask-based padding. Scale the config up
(L=24, d=1024, h=16 ≈ roberta-large) for the v5e-8 north-star benchmark.
"""

import flax.linen as nn
import jax.numpy as jnp


class _HeadProj(nn.Module):
    """q/k/v projection emitting (B, H, L, Dh) directly.

    Parameter names/shapes/inits are identical to flax's
    ``nn.DenseGeneral(features=(H, Dh), axis=-1)`` — kernel (d, H, Dh),
    bias (H, Dh) — so weights transplant with the einsum-attention path.
    Emitting the kernel's (B, H, L, Dh) layout from the projection einsum
    itself (instead of DenseGeneral + ``swapaxes``) lets XLA fold the
    relayout into the matmul epilogue rather than materializing a
    (B, L, H, Dh) intermediate and copying it — the r4/r5 in-context flash
    study measured those boundary copies as the kernel's binding cost.
    """

    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x):  # (B, L, d) -> (B, H, L, Dh)
        d = x.shape[-1]
        # init on the flattened (d, H*Dh) shape, like DenseGeneral does,
        # so fan-in/fan-out match the einsum-attention path exactly
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype: nn.initializers.lecun_normal()(
                key, (d, self.heads * self.head_dim), dtype
            ).reshape(shape),
            (d, self.heads, self.head_dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.heads, self.head_dim), jnp.float32)
        y = jnp.einsum("bld,dhk->bhlk", x, kernel.astype(x.dtype))
        return y + bias.astype(x.dtype)[None, :, None, :]


class _OutProj(nn.Module):
    """Output projection consuming (B, H, L, Dh) natively -> (B, L, d).

    Parameter shapes match ``nn.DenseGeneral(features=d, axis=(-2, -1))``
    on a (B, L, H, Dh) input — kernel (H, Dh, d), bias (d,).
    """

    features: int

    @nn.compact
    def __call__(self, o):  # (B, H, L, Dh) -> (B, L, d)
        h, dh = o.shape[1], o.shape[-1]
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype: nn.initializers.lecun_normal()(
                key, (h * dh, self.features), dtype
            ).reshape(shape),
            (h, dh, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = jnp.einsum("bhlk,hkd->bld", o, kernel.astype(o.dtype))
        return y + bias.astype(o.dtype)


class FlashSelfAttention(nn.Module):
    """Self-attention through the blockwise Pallas kernel
    (betty_tpu/ops/flash_attention.py). Parameter structure and shapes are
    IDENTICAL to ``nn.MultiHeadDotProductAttention`` (query/key/value/out
    DenseGeneral), so weights transplant between the two paths — the
    numeric-parity tests rely on it.

    ``kv_mask`` is the (B, L) key-padding mask (True = attend); query rows
    are left unmasked, which every model here masks downstream (see the
    kernel's module docstring). No attention-probability dropout on this
    path (flash kernels and the reference's SAMA workloads both run
    without it).
    """

    num_heads: int
    qkv_features: int
    causal: bool = False
    # None = the kernel's measured-best defaults (512/512 on v5e at
    # seq>=512 — see flash_attention()); a fixed 128 here used to pin the
    # in-context path to the ~1.0x block shape while the isolated bench
    # ran the 2x one.
    block_q: int | None = None
    block_kv: int | None = None

    @nn.compact
    def __call__(self, x, kv_mask=None):
        from betty_tpu.ops.flash_attention import flash_attention

        head_dim = self.qkv_features // self.num_heads
        proj = lambda name: _HeadProj(  # noqa: E731
            heads=self.num_heads, head_dim=head_dim, name=name)
        q = proj("query")(x)  # (B, H, L, D) — kernel-native layout
        k = proj("key")(x)
        v = proj("value")(x)
        o = flash_attention(q, k, v, kv_mask, causal=self.causal,
                            block_q=self.block_q, block_kv=self.block_kv)
        return _OutProj(features=x.shape[-1], name="out")(o)


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dropout: float = 0.1
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, mask=None, kv_mask=None, train: bool = True):
        # pre-LN transformer block
        y = nn.LayerNorm()(x)
        if self.use_flash:
            y = FlashSelfAttention(
                num_heads=self.heads, qkv_features=self.dim,
                name="MultiHeadDotProductAttention_0",  # weight-compatible
            )(y, kv_mask=kv_mask)
        else:
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads,
                qkv_features=self.dim,
                dropout_rate=self.dropout,
                deterministic=not train,
            )(y, mask=mask)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = x + y

        y = nn.LayerNorm()(x)
        y = nn.Dense(self.dim * self.mlp_ratio)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class TransformerClassifier(nn.Module):
    vocab_size: int = 50265
    max_len: int = 128
    dim: int = 256
    depth: int = 4
    heads: int = 8
    num_classes: int = 2
    dropout: float = 0.1
    pad_id: int = 1
    use_flash: bool = False  # route attention through the Pallas kernel
    remat: bool = False      # rematerialize each block in the backward
    # None = blanket per-block remat (replay the whole block forward in
    # the backward) — except flash residuals, which are still saved (see
    # below). "minimal" = blanket remat with NOTHING saved, including
    # flash residuals: the Pallas forward kernel is replayed inside the
    # backward. Minimum HBM; at seq>=512 the saved flash residuals
    # (q/k/v/o/lse x depth x unroll ~ 4GB at B8/S512/355M) are what OOMs
    # the shared chip, so "minimal" is the policy that lets flash run at
    # long sequence at all. "dots" = jax.checkpoint_policies.
    # checkpoint_dots: SAVE every matmul output (the MXU work) and replay
    # only the cheap VPU elementwise math (LN/gelu/bias/softmax) — costs
    # ~100MB/layer of activations at B32/S128/d1024 but removes the full
    # forward replay from the backward (the recompute that blanket remat
    # spends ~1/4 of the step on at the north-star scale). NOTE at S512
    # "dots" saves the (B,H,S,S) score matrix per layer per unroll step
    # (~16GB at B8/355M/unroll5) — it does not fit; use None/"minimal".
    remat_policy: str | None = None

    @nn.compact
    def __call__(self, input_ids, train: bool = True):
        B, L = input_ids.shape
        pad_mask = input_ids != self.pad_id  # (B, L)
        attn_mask = nn.make_attention_mask(pad_mask, pad_mask)

        tok = nn.Embed(self.vocab_size, self.dim)(input_ids)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, self.max_len, self.dim),
        )
        x = tok + pos[:, :L]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        block_cls = EncoderBlock
        if self.remat:
            import jax

            if self.remat_policy in (None, "minimal"):
                policy = None
            elif self.remat_policy == "dots":
                policy = jax.checkpoint_policies.checkpoint_dots
            else:
                raise ValueError(
                    f"remat_policy={self.remat_policy!r}: expected None "
                    "(blanket), 'minimal' (blanket even for flash "
                    "residuals) or 'dots' (save matmul outputs)")
            if self.use_flash and self.remat_policy != "minimal":
                # Selective remat: keep the flash kernel's residuals
                # (its backward recomputes scores internally — replaying
                # the pallas forward too costs ~3x attention compute),
                # rematerialize only the cheap dense/LN/MLP math.
                from betty_tpu.ops import flash_attention as _fa

                fa_policy = _fa.remat_policy()
                policy = fa_policy if policy is None else (
                    jax.checkpoint_policies.save_from_both_policies(
                        policy, fa_policy))
            if policy is None:
                block_cls = nn.remat(EncoderBlock, static_argnums=(4,))
            else:
                block_cls = nn.remat(EncoderBlock, static_argnums=(4,),
                                     policy=policy)
        for _ in range(self.depth):
            x = block_cls(self.dim, self.heads, dropout=self.dropout,
                          use_flash=self.use_flash)(
                x, attn_mask, pad_mask, train
            )
        x = nn.LayerNorm()(x)

        # masked mean pool
        denom = jnp.maximum(pad_mask.sum(axis=1, keepdims=True), 1)
        pooled = (x * pad_mask[..., None]).sum(axis=1) / denom
        pooled = nn.tanh(nn.Dense(self.dim)(pooled))
        return nn.Dense(self.num_classes)(pooled)


def roberta_large_config(num_classes: int = 2, max_len: int = 128,
                         use_flash: bool = False, remat: bool = False,
                         dropout: float = 0.1, remat_policy=None):
    """The north-star scale (≈355M params)."""
    return TransformerClassifier(
        vocab_size=50265, max_len=max_len, dim=1024, depth=24, heads=16,
        num_classes=num_classes, use_flash=use_flash, remat=remat,
        dropout=dropout, remat_policy=remat_policy,
    )


def make_pipelined_transformer(
    mesh=None,
    *,
    vocab_size: int = 50265,
    max_len: int = 128,
    dim: int = 256,
    depth: int = 4,
    heads: int = 8,
    num_classes: int = 2,
    pad_id: int = 1,
    axis: str = "pp",
    num_microbatches=None,
    seq_axis=None,
    rng=None,
):
    """A TransformerClassifier whose encoder stack runs as a GPipe pipeline
    over ``mesh[axis]`` (betty_tpu/parallel/pipeline.py) — pipeline
    parallelism beyond the reference's DP-family strategies.

    Returns a :class:`~betty_tpu.module.FunctionalModule`; block parameters
    are STACKED with a leading depth axis under ``params["blocks"]`` — shard
    that axis over ``pp`` with ``Config(shard_rules=((r"^blocks", ("pp",)),))``
    under ``strategy="tp"`` so each device holds only its stage. When
    ``mesh`` is None (or lacks ``axis``) the same module runs the stack
    sequentially on one device — identical numerics, used for parity tests.

    Blocks are built dropout-free (pipeline microbatching would need
    per-microbatch RNG threading; the reference's SAMA workloads run with
    dropout disabled for hypergradient stability anyway).

    ``seq_axis``: optional SEQUENCE-PARALLEL mode (mutually exclusive with
    pipelining): activations between blocks are sharding-constrained to
    ``P(dp, seq_axis, None)`` so LayerNorm/MLP compute partitions over the
    sequence dimension, with GSPMD inserting the gathers attention needs —
    the Megatron-SP layout (arXiv:2205.05198 §4.2).
    """
    import jax

    from betty_tpu.module import FunctionalModule
    from betty_tpu.parallel.pipeline import gpipe, sequential, stack_block_params

    if rng is None:
        rng = jax.random.PRNGKey(0)
    block = EncoderBlock(dim, heads, dropout=0.0)
    sample_h = jnp.zeros((1, max_len, dim), jnp.float32)
    sample_m = jnp.ones((1, 1, max_len, max_len), jnp.float32)

    def block_init(key):
        return block.init(key, sample_h, mask=sample_m, train=False)["params"]

    k_blocks, k_emb, k_head1, k_head2 = jax.random.split(rng, 4)
    init = jax.nn.initializers.normal(0.02)
    params = {
        "embed": {
            "tok": init(k_emb, (vocab_size, dim), jnp.float32),
            "pos": init(jax.random.fold_in(k_emb, 1), (1, max_len, dim),
                        jnp.float32),
        },
        "blocks": stack_block_params(block_init, k_blocks, depth),
        "head": {
            "ln_scale": jnp.ones((dim,)),
            "ln_bias": jnp.zeros((dim,)),
            "pool_w": init(k_head1, (dim, dim), jnp.float32),
            "pool_b": jnp.zeros((dim,)),
            "out_w": init(k_head2, (dim, num_classes), jnp.float32),
            "out_b": jnp.zeros((num_classes,)),
        },
    }

    def block_apply(p_i, carry):
        h, mask = carry
        out = block.apply({"params": p_i}, h, mask=mask, train=False)
        return (out, mask)

    pipelined = mesh is not None and axis in getattr(mesh, "shape", {})
    seq_parallel = (
        not pipelined
        and seq_axis is not None
        and mesh is not None
        and seq_axis in getattr(mesh, "shape", {})
    )
    if seq_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        _act_sharding = NamedSharding(
            mesh,
            _P("dp" if "dp" in mesh.shape else None, seq_axis, None),
        )

        def _constrain(h):
            return jax.lax.with_sharding_constraint(h, _act_sharding)
    else:
        _constrain = lambda h: h  # noqa: E731

    def apply_fn(variables, input_ids, train=True, rngs=None, mutable=(),
                 **kwargs):
        p = variables["params"]
        L = input_ids.shape[1]
        pad_mask = input_ids != pad_id
        attn_mask = (
            pad_mask[:, None, :, None] & pad_mask[:, None, None, :]
        ).astype(jnp.float32)  # nn.make_attention_mask semantics

        x = jnp.take(p["embed"]["tok"], input_ids, axis=0)
        x = x + p["embed"]["pos"][:, :L]

        if pipelined:
            x, _ = gpipe(block_apply, p["blocks"], (x, attn_mask), mesh,
                         axis=axis, num_microbatches=num_microbatches)
        elif seq_parallel:
            def sp_block(p_i, carry):
                h, m = block_apply(p_i, carry)
                return (_constrain(h), m)

            x, _ = sequential(sp_block, p["blocks"], (_constrain(x), attn_mask))
        else:
            x, _ = sequential(block_apply, p["blocks"], (x, attn_mask))

        h = p["head"]
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-6) * h["ln_scale"] + h["ln_bias"]
        denom = jnp.maximum(pad_mask.sum(axis=1, keepdims=True), 1)
        pooled = (x * pad_mask[..., None]).sum(axis=1) / denom
        pooled = jnp.tanh(pooled @ h["pool_w"] + h["pool_b"])
        out = pooled @ h["out_w"] + h["out_b"]
        if mutable:
            return out, {}
        return out

    return FunctionalModule(apply_fn, variables={"params": params})
