"""SASRec baseline encoder (research stack).

TPU twin of `research/modeling/sequential/sasrec.py:50-317`: pre-LN softmax
transformer with Conv1D(kernel=1) FFN (== Dense), causal mask, sampled-softmax
compatible interface.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.normalization import layer_norm


def _xavier_normal_full(key, shape, dtype=jnp.float32):
    """torch xavier_normal_ over the *entire* tensor (fan_in=shape[1],
    fan_out=shape[0]) — used for the fused 3D x D in_proj weight."""
    fan_out, fan_in = shape[0], shape[1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class SoftmaxMultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention twin (batch_first, bool attn_mask blocks)."""

    embed_dim: int
    num_heads: int
    dropout: float

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # [B, N, D]
        key: jax.Array,
        value: jax.Array,
        attn_mask: jax.Array,  # bool[N, N]; True = DISALLOWED (torch semantics)
        deterministic: bool = False,
    ) -> jax.Array:
        D, H = self.embed_dim, self.num_heads
        dh = D // H
        in_proj_w = self.param("in_proj_weight", _xavier_normal_full, (3 * D, D))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * D,))
        q = query @ in_proj_w[:D].T + in_proj_b[:D]
        k = key @ in_proj_w[D : 2 * D].T + in_proj_b[D : 2 * D]
        v = value @ in_proj_w[2 * D :].T + in_proj_b[2 * D :]
        B, N, _ = q.shape
        q = q.reshape(B, N, H, dh)
        k = k.reshape(B, N, H, dh)
        v = v.reshape(B, N, H, dh)
        scores = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / (dh**0.5)
        scores = jnp.where(attn_mask[None, None], -jnp.inf, scores)
        p = jax.nn.softmax(scores, axis=-1)
        # The causal mask always allows the diagonal, so no all-masked rows.
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(B, N, D)
        out_w = self.param("out_proj_weight", _xavier_normal_full, (D, D))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (D,))
        return out @ out_w.T + out_b


class StandardAttentionFF(nn.Module):
    """Conv1D(k=1) -> act -> dropout -> Conv1D(k=1) -> dropout, residual
    (`sasrec.py:50-82`)."""

    embedding_dim: int
    hidden_dim: int
    activation_fn: str
    dropout_rate: float

    @nn.compact
    def __call__(self, inputs: jax.Array, deterministic: bool = False) -> jax.Array:
        x = nn.Dense(
            self.hidden_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="conv1",
        )(inputs)
        x = jax.nn.gelu(x, approximate=False) if self.activation_fn == "gelu" else jax.nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(
            self.embedding_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="conv2",
        )(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x + inputs


class SASRecEncoder(nn.Module):
    """Pre-LN causal transformer stack (`sasrec.py:198-258`)."""

    embedding_dim: int
    num_blocks: int
    num_heads: int
    ffn_hidden_dim: int
    ffn_activation_fn: str = "relu"
    ffn_dropout_rate: float = 0.2

    @nn.compact
    def __call__(
        self,
        user_embeddings: jax.Array,  # [B, N, D] (already preprocessed)
        lengths: jax.Array,
        all_timestamps: Optional[jax.Array] = None,
        deterministic: bool = False,
        valid_mask: Optional[jax.Array] = None,  # [B, N, 1]
    ) -> jax.Array:
        B, N, D = user_embeddings.shape
        attn_mask = jnp.triu(jnp.ones((N, N), jnp.bool_), k=1)  # True = blocked
        if valid_mask is None:
            valid_mask = jnp.ones((B, N, 1), user_embeddings.dtype)
        x = user_embeddings
        for i in range(self.num_blocks):
            q = layer_norm(x, eps=1e-8)
            mha_out = SoftmaxMultiheadAttention(
                embed_dim=D,
                num_heads=self.num_heads,
                dropout=self.ffn_dropout_rate,
                name=f"attn_{i}",
            )(q, x, x, attn_mask, deterministic=deterministic)
            x = StandardAttentionFF(
                embedding_dim=D,
                hidden_dim=self.ffn_hidden_dim,
                activation_fn=self.ffn_activation_fn,
                dropout_rate=self.ffn_dropout_rate,
                name=f"ffn_{i}",
            )(layer_norm(q + mha_out, eps=1e-8), deterministic=deterministic)
            x = x * valid_mask
        return x
