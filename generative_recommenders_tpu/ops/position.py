"""Timestamp + position embedding addition (padded-dense).

TPU twin of `ops/position.py:38` (add_timestamp_positional_embeddings) with
eager semantics from `ops/pytorch/pt_position.py:39-135` (fused Triton
version: `ops/triton/triton_position.py:62-238`). On TPU the whole op is a
few gathers + adds — XLA fuses it; the Triton kernel's custom backward
(sorted segment-sum via the `sort_kv_pairs` CUDA op, N5 in SURVEY §2.2) is
unnecessary because XLA emits an efficient scatter-add for the embedding
gradients.

Position index semantics (`pt_position.py:39-69`, _get_col_indices): indices
count DOWN from the last non-target position (so the most recent real event
always has index `contextual + 0..`), targets share the terminal index;
contextual rows get fixed indices [0, C).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _position_indices(
    N: int,
    seq_lengths: jax.Array,  # int[B]
    num_targets: Optional[jax.Array],
    max_contextual_seq_len: int,
    max_pos_ind: int,
    interleave_targets: bool = False,
) -> jax.Array:
    B = seq_lengths.shape[0]
    col = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    if num_targets is not None:
        mult = 2 if interleave_targets else 1
        high = (seq_lengths - mult * num_targets).astype(jnp.int32)[:, None]
        col = jnp.minimum(col, high)
        col = high - col
    else:
        col = seq_lengths.astype(jnp.int32)[:, None] - col
    col = col + max_contextual_seq_len
    col = jnp.clip(col, None, max_pos_ind - 1)
    if max_contextual_seq_len > 0:
        ctx = jnp.arange(max_contextual_seq_len, dtype=jnp.int32)
        col = col.at[:, :max_contextual_seq_len].set(ctx[None, :])
    return jnp.clip(col, 0, max_pos_ind - 1)


def _timestamp_buckets(
    timestamps: jax.Array,  # int/float[B, N]
    seq_lengths: jax.Array,  # int[B]
    num_buckets: int,
    time_bucket_fn: str = "sqrt",
    time_bucket_increments: float = 60.0,
    query_time: Optional[jax.Array] = None,  # [B]: override ts[len-1]
) -> jax.Array:
    B, N = timestamps.shape
    ts = timestamps.astype(jnp.float32)
    if query_time is not None:
        query_time = query_time.astype(jnp.float32).reshape(B, 1)
    else:
        q_idx = jnp.clip(seq_lengths.astype(jnp.int32) - 1, 0, N - 1)
        query_time = jnp.take_along_axis(ts, q_idx[:, None], axis=1)  # [B, 1]
    dt = jnp.maximum(query_time - ts, 1e-6) / time_bucket_increments
    if time_bucket_fn == "log":
        x = jnp.log(dt)
    else:
        x = jnp.sqrt(dt)
    return jnp.clip(x.astype(jnp.int32), 0, num_buckets)


def add_timestamp_positional_embeddings(
    seq_embeddings: jax.Array,  # [B, N, D]
    seq_lengths: jax.Array,  # int[B]
    timestamps: jax.Array,  # [B, N]
    position_embeddings: jax.Array,  # [num_position_buckets, D]
    timestamp_embeddings: jax.Array,  # [num_time_buckets + 1, D]
    *,
    alpha: float,
    num_targets: Optional[jax.Array] = None,
    max_contextual_seq_len: int = 0,
    interleave_targets: bool = False,
    time_bucket_fn: str = "sqrt",
    query_time: Optional[jax.Array] = None,
) -> jax.Array:
    """out = seq_embeddings * alpha + pos_emb[pos_idx] + ts_emb[ts_bucket].

    Note: the reference eager path reads the bucket count from
    `ts_embeddings.size(1) - 1` (`pt_position.py:98`) — i.e. embedding_dim-1,
    which mismatches the table built with num_time_buckets+1 rows
    (`positional_encoder.py:45-50`); we use rows-1, the evident intent.
    """
    B, N, D = seq_embeddings.shape
    pos_idx = _position_indices(
        N, seq_lengths, num_targets, max_contextual_seq_len,
        position_embeddings.shape[0], interleave_targets,
    )
    ts_idx = _timestamp_buckets(
        timestamps, seq_lengths, timestamp_embeddings.shape[0] - 1,
        time_bucket_fn, query_time=query_time,
    )
    add = jnp.take(position_embeddings, pos_idx, axis=0) + jnp.take(
        timestamp_embeddings, ts_idx, axis=0
    )
    return (seq_embeddings * alpha + add.astype(seq_embeddings.dtype)).astype(
        seq_embeddings.dtype
    )
