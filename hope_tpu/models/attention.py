"""Minimal ViT-style encoder over modality tokens (reference model/attention.py).

Flax redesign: pre-norm multi-head attention + tanh feed-forward with residuals,
then a flatten + 2-layer head.  The reference's ``view_embed`` positional
parameter exists but is never added to the input (attention.py:88-89) — omitted.
Note the reference's orthogonal_init loop never increments its counter
(network.py:105-113), so every weight effectively gets gain 1.0; mirrored here.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

ORTHO = nn.initializers.orthogonal(1.0)


class MultiHeadAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        # x: (B, N, dim)
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=ORTHO, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.dim, kernel_init=ORTHO, name="to_out")(out)


class FeedForward(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=ORTHO)(x)
        x = jnp.tanh(x)
        return nn.Dense(self.dim, kernel_init=ORTHO)(x)


class TransformerEncoder(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        for _ in range(self.depth):
            x = MultiHeadAttention(self.dim, self.heads, self.dim_head)(nn.LayerNorm()(x)) + x
            x = FeedForward(self.dim, self.mlp_dim)(nn.LayerNorm()(x)) + x
        return x


class AttentionFusion(nn.Module):
    """Encoder over modality tokens -> flatten -> 2-layer head
    (reference AttentionNetwork :76-92)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    hidden_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, tokens):
        x = TransformerEncoder(self.dim, self.depth, self.heads,
                               self.dim_head, self.mlp_dim)(tokens)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.hidden_dim, kernel_init=ORTHO)(x)
        x = jnp.tanh(x)
        return nn.Dense(self.output_dim, kernel_init=ORTHO)(x)
