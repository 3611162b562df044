"""Sequence tensor utilities (research stack).

TPU twin of `research/modeling/sequential/utils.py:21-129`: flattened-index
gather/scatter, last-valid-step extraction, and dim0 repeat/select over
either dense [B, ...] or batched-candidate [B, X, D] layouts.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp


def batch_gather_embeddings(
    rowwise_indices: jax.Array,  # int[B, L] in [0, N)
    embeddings: jax.Array,  # [B, N, D]
) -> jax.Array:
    """out[b, l] = embeddings[b, rowwise_indices[b, l]] (`utils.py:21-44`)."""
    return jnp.take_along_axis(
        embeddings, rowwise_indices[..., None].astype(jnp.int32), axis=1
    )


def batch_scatter_embeddings(
    dst: jax.Array,  # [B, N, D]
    rowwise_indices: jax.Array,  # int[B]
    src: jax.Array,  # [B, D]
) -> jax.Array:
    """dst[b, rowwise_indices[b]] = src[b] (`utils.py:47-62`)."""
    B = dst.shape[0]
    rows = jnp.arange(B, dtype=jnp.int32)
    return dst.at[rows, rowwise_indices.astype(jnp.int32)].set(src)


def get_current_embeddings(
    lengths: jax.Array,  # int[B]
    encoded_embeddings: jax.Array,  # [B, N, D]
) -> jax.Array:
    """out[b] = encoded[b, lengths[b] - 1] (`utils.py:65-96`)."""
    B, N, D = encoded_embeddings.shape
    idx = jnp.clip(lengths.astype(jnp.int32) - 1, 0, N - 1)
    return jnp.take_along_axis(
        encoded_embeddings, idx[:, None, None], axis=1
    )[:, 0]


def jagged_or_dense_repeat_interleave_dim0(
    x: jax.Array, lengths: jax.Array, repeats: int
) -> jax.Array:
    """Dense [B, N, ...] -> [B*r, N, ...] (`utils.py:99-114`); the padded
    layout makes the jagged/dense distinction vanish."""
    return jnp.repeat(x, repeats, axis=0)


def jagged_or_dense_index_select_dim0(
    x: jax.Array, lengths: jax.Array, indices: jax.Array
) -> jax.Array:
    """Dense row selection (`utils.py:117-129`)."""
    return jnp.take(x, indices.astype(jnp.int32), axis=0)
