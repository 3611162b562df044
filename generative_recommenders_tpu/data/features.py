"""Batch -> SequentialFeatures conversion (in-jit).

TPU twin of `research/modeling/sequential/features.py:22-94`
(movielens_seq_features_from_row): reserves ``max_output_length`` tail slots
and scatters the target timestamp at position ``lengths`` so the target-step
relative-time bias sees the query time.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class SequentialFeatures(NamedTuple):
    past_lengths: jax.Array  # int[B]
    past_ids: jax.Array  # int[B, N]
    past_embeddings: Optional[jax.Array]  # [B, N, D] or None
    past_payloads: Dict[str, jax.Array]


def seq_features_from_row(
    row: Dict[str, jax.Array],
    max_output_length: int,
) -> Tuple[SequentialFeatures, jax.Array, jax.Array]:
    """Returns (features, target_ids [B, 1], target_ratings [B, 1])."""
    lengths = row["history_lengths"].astype(jnp.int32)
    ids = row["historical_ids"].astype(jnp.int32)
    ratings = row["historical_ratings"].astype(jnp.int32)
    timestamps = row["historical_timestamps"].astype(jnp.int32)
    target_ids = row["target_ids"].astype(jnp.int32).reshape(-1, 1)
    target_ratings = row["target_ratings"].astype(jnp.int32).reshape(-1, 1)
    target_ts = row["target_timestamps"].astype(jnp.int32).reshape(-1, 1)
    B = ids.shape[0]
    if max_output_length > 0:
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((B, max_output_length), x.dtype)], axis=1
        )
        ids, ratings, timestamps = pad(ids), pad(ratings), pad(timestamps)
        # scatter target timestamp at position lengths (features.py:79-83)
        rows = jnp.arange(B, dtype=jnp.int32)
        timestamps = timestamps.at[rows, lengths].set(target_ts[:, 0])
    features = SequentialFeatures(
        past_lengths=lengths,
        past_ids=ids,
        past_embeddings=None,
        past_payloads={"timestamps": timestamps, "ratings": ratings},
    )
    return features, target_ids, target_ratings


def scatter_target_into_ids(
    past_ids: jax.Array, lengths: jax.Array, target_ids: jax.Array
) -> jax.Array:
    """past_ids[b, lengths[b]] = target_ids[b] (`research/trainer/train.py:358-362`)."""
    B = past_ids.shape[0]
    rows = jnp.arange(B, dtype=jnp.int32)
    return past_ids.at[rows, lengths].set(target_ids.reshape(-1))
