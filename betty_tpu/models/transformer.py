"""Transformer encoder classifier (RoBERTa-style) for SAMA data reweighting.

Capability counterpart of the reference's use of HF roberta-large in
``examples/bert_data_reweighting/main.py``. TPU-first design: bf16-friendly
einsum attention (MXU-shaped heads), fused residual blocks left to XLA,
static sequence lengths, mask-based padding. Scale the config up
(L=24, d=1024, h=16 ≈ roberta-large) for the v5e-8 north-star benchmark.
"""

import flax.linen as nn
import jax.numpy as jnp


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        # pre-LN transformer block
        y = nn.LayerNorm()(x)
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

        for _ in range(self.depth):
            x = EncoderBlock(self.dim, self.heads, dropout=self.dropout)(
                x, mask=attn_mask, train=train
            )
        x = nn.LayerNorm()(x)

        # masked mean pool
        denom = jnp.maximum(pad_mask.sum(axis=1, keepdims=True), 1)
        pooled = (x * pad_mask[..., None]).sum(axis=1) / denom
        pooled = nn.tanh(nn.Dense(self.dim)(pooled))
        return nn.Dense(self.num_classes)(pooled)


def roberta_large_config(num_classes: int = 2, max_len: int = 128):
    """The north-star scale (≈355M params)."""
    return TransformerClassifier(
        vocab_size=50265, max_len=max_len, dim=1024, depth=24, heads=16,
        num_classes=num_classes,
    )
