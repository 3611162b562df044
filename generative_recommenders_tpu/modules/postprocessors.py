"""Output postprocessors (production stack).

TPU twin of `modules/postprocessors.py:54-176`: L2-norm, LayerNorm, and the
timestamp polar-feature LayerNorm postprocessor.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.normalization import layer_norm


class L2NormPostprocessor(nn.Module):
    """`postprocessors.py:55-69`."""

    @nn.compact
    def __call__(
        self,
        seq_embeddings: jax.Array,
        seq_timestamps: Optional[jax.Array] = None,
    ) -> jax.Array:
        norm = jnp.maximum(
            jnp.linalg.norm(seq_embeddings, axis=-1, keepdims=True), 1e-6
        )
        return seq_embeddings / norm


class LayerNormPostprocessor(nn.Module):
    """`postprocessors.py:72-95`."""

    embedding_dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        seq_embeddings: jax.Array,
        seq_timestamps: Optional[jax.Array] = None,
    ) -> jax.Array:
        w = self.param("ln_weight", nn.initializers.ones, (self.embedding_dim,))
        b = self.param("ln_bias", nn.initializers.zeros, (self.embedding_dim,))
        return layer_norm(seq_embeddings, w, b, eps=self.eps)


class TimestampLayerNormPostprocessor(nn.Module):
    """`postprocessors.py:104-176`: polar (cos, sin) encodings of periodic
    time features (e.g. hour-of-day (3600, 24), day-of-week (86400, 7))
    concatenated to the embedding, combined by a linear layer, then LN."""

    embedding_dim: int
    time_duration_features: Tuple[Tuple[int, int], ...]  # (period_unit, units_per_period)
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        seq_embeddings: jax.Array,  # [..., D]
        seq_timestamps: jax.Array,  # [...] matching leading dims
    ) -> jax.Array:
        period_units = jnp.asarray(
            [f[0] for f in self.time_duration_features], jnp.float32
        )
        units_per_period = jnp.asarray(
            [f[1] for f in self.time_duration_features], jnp.float32
        )
        ts = seq_timestamps.astype(jnp.float32)[..., None]
        units_since_epoch = jnp.floor(ts / period_units)
        phase = (
            jnp.remainder(units_since_epoch, units_per_period)
            / units_per_period
            * 2.0
            * 3.14  # the reference hardcodes 3.14 (`postprocessors.py:150`)
        )
        polar = jnp.stack([jnp.cos(phase), jnp.sin(phase)], axis=-1).reshape(
            *phase.shape[:-1], -1
        )
        combined = jnp.concatenate(
            [seq_embeddings, polar.astype(seq_embeddings.dtype)], axis=-1
        )
        out = nn.Dense(
            self.embedding_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="time_feature_combiner",
        )(combined)
        w = self.param("ln_weight", nn.initializers.ones, (self.embedding_dim,))
        b = self.param("ln_bias", nn.initializers.zeros, (self.embedding_dim,))
        return layer_norm(out, w, b, eps=self.eps)
