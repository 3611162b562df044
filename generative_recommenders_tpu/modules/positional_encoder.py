"""HSTU positional encoder (production stack).

TPU twin of `modules/positional_encoder.py:27-75`: learned position buckets
(count-down indices) + bucketized time-delta embeddings, added with a
sqrt(D) input scale via the fused position op.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.position import (
    add_timestamp_positional_embeddings,
)


def _uniform(scale):
    def init(key, shape, dtype=jnp.float32):
        lim = (1.0 / scale) ** 0.5
        return jax.random.uniform(key, shape, dtype, -lim, lim)

    return init


class HSTUPositionalEncoder(nn.Module):
    num_position_buckets: int
    num_time_buckets: int
    embedding_dim: int
    contextual_seq_len: int = 0
    time_bucket_fn: str = "sqrt"

    def setup(self) -> None:
        # U(-sqrt(1/buckets), sqrt(1/buckets)) init (`positional_encoder.py:39-50`)
        self._pos_w = self.param(
            "position_embeddings_weight",
            _uniform(self.num_position_buckets),
            (self.num_position_buckets, self.embedding_dim),
        )
        self._ts_w = self.param(
            "timestamp_embeddings_weight",
            _uniform(self.num_time_buckets),
            (self.num_time_buckets + 1, self.embedding_dim),
        )

    def __call__(
        self,
        seq_embeddings: jax.Array,  # [B, N, D]
        seq_lengths: jax.Array,  # int[B]
        seq_timestamps: jax.Array,  # [B, N]
        num_targets: Optional[jax.Array] = None,
        query_time: Optional[jax.Array] = None,
    ) -> jax.Array:
        return add_timestamp_positional_embeddings(
            seq_embeddings,
            seq_lengths,
            seq_timestamps,
            self._pos_w,
            self._ts_w,
            alpha=self.embedding_dim**0.5,
            num_targets=num_targets,
            max_contextual_seq_len=self.contextual_seq_len,
            time_bucket_fn=self.time_bucket_fn,
            query_time=query_time,
        )

    def delta(
        self,
        cand_embeddings: jax.Array,  # [B, m, D]
        cand_timestamps: jax.Array,  # [B, m]
        query_time: jax.Array,  # [B]
    ) -> jax.Array:
        """M-FALCON delta twin of __call__ for candidate (target) tokens:
        position index is the constant target index (contextual offset);
        time bucket is measured against the query time."""
        from generative_recommenders_tpu.ops.position import (
            _timestamp_buckets,
        )

        B, m, D = cand_embeddings.shape
        pos = self._pos_w[self.contextual_seq_len]  # target pos index
        ts_idx = _timestamp_buckets(
            cand_timestamps, jnp.full((B,), m, jnp.int32),
            self._ts_w.shape[0] - 1, self.time_bucket_fn,
            query_time=query_time,
        )
        add = pos[None, None, :] + jnp.take(self._ts_w, ts_idx, axis=0)
        return (
            cand_embeddings * (self.embedding_dim**0.5)
            + add.astype(cand_embeddings.dtype)
        )
