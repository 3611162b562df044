"""Contextualized MLPs (production stack), padded-dense.

TPU twin of `modules/contextualize_mlps.py:30-143`:
  * SimpleContextualizedMLP — plain Linear→SwishLN→Linear→LN, context ignored;
  * ParameterizedContextualizedMLP — the contextual embedding generates a
    per-example [Din, Dout] weight matrix (LayerNorm'ed) applied to every
    sequence position plus a contextual bias (the reference's
    jagged_dense_bmm_broadcast_add, `ops/triton/triton_jagged.py:60-242` —
    one einsum in padded layout).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.modules.mlp import SwishLayerNorm, SwishMLP
from generative_recommenders_tpu.ops.normalization import layer_norm


class SimpleContextualizedMLP(nn.Module):
    sequential_output_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(
        self,
        seq_embeddings: jax.Array,  # [B, N, Din]
        contextual_embeddings: Optional[jax.Array] = None,  # unused
    ) -> jax.Array:
        return SwishMLP(
            self.hidden_dim, self.sequential_output_dim, name="mlp"
        )(seq_embeddings)


class ParameterizedContextualizedMLP(nn.Module):
    sequential_input_dim: int
    sequential_output_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(
        self,
        seq_embeddings: jax.Array,  # [B, N, Din]
        contextual_embeddings: jax.Array,  # [B, Dc]
    ) -> jax.Array:
        shared = nn.Dense(
            self.hidden_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="dense_features_compress",
        )(contextual_embeddings)  # [B, H]
        raw_w = nn.Dense(
            self.sequential_input_dim * self.sequential_output_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="attn_raw_weights",
        )(shared).reshape(
            -1, self.sequential_input_dim, self.sequential_output_dim
        )
        # LayerNorm over the full [Din, Dout] weight matrix with affine params
        wshape = (self.sequential_input_dim, self.sequential_output_dim)
        ln_w = self.param("attn_w_norm_weight", nn.initializers.ones, wshape)
        ln_b = self.param("attn_w_norm_bias", nn.initializers.zeros, wshape)
        mean = jnp.mean(raw_w, axis=(1, 2), keepdims=True)
        var = jnp.var(raw_w, axis=(1, 2), keepdims=True)
        w = (raw_w - mean) * jax.lax.rsqrt(var + 1e-5) * ln_w + ln_b

        bias = nn.Dense(
            self.hidden_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="res_fc1",
        )(shared)
        bias = SwishLayerNorm(self.hidden_dim, name="res_sln")(bias)
        bias = nn.Dense(
            self.sequential_output_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="res_fc2",
        )(bias)  # [B, Dout]
        # jagged_dense_bmm_broadcast_add in padded layout
        return (
            jnp.einsum(
                "bnd,bde->bne", seq_embeddings, w.astype(seq_embeddings.dtype),
                preferred_element_type=jnp.float32,
            ).astype(seq_embeddings.dtype)
            + bias[:, None, :].astype(seq_embeddings.dtype)
        )
