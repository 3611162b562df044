"""HSTU attention validity mask.

Replicates the semantics of the reference's eager spec `_get_valid_attn_mask`
(`generative_recommenders/ops/pytorch/pt_hstu_attention.py:32-84`) in pure jnp:

  * causal (row >= col) with the diagonal always valid,
  * target-aware masking: the last ``num_targets[b]`` rows of a sequence are
    "candidates"; their effective position is clamped to the last
    non-target position so every candidate attends to the full history but
    not to other candidates (the M-FALCON trick),
  * local attention window ``max_attn_len`` with an optional
    ``min_full_attn_seq_len`` recent full-attention window,
  * ``contextual_seq_len`` prefix rows that attend to (and are attended by)
    the whole valid sequence.

This is the single source of truth used by the XLA reference kernel, the
Pallas kernels' differential tests, and the model-level invariance tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def make_valid_attn_mask(
    N: int,
    seq_lengths: jax.Array,  # int[B]
    causal: bool = True,
    num_targets: Optional[jax.Array] = None,  # int[B]
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    min_full_attn_seq_len: int = 0,
) -> jax.Array:
    """Returns bool[B, N, N]; entry [b, i, j] == True iff query i may attend key j."""
    B = seq_lengths.shape[0]
    ids = jnp.arange(N, dtype=jnp.int32)[None, :]  # [1, N]
    max_ids = seq_lengths.reshape(B, 1, 1).astype(jnp.int32)
    if contextual_seq_len > 0:
        ids = jnp.maximum(ids - contextual_seq_len + 1, 0)
        max_ids = max_ids - contextual_seq_len + 1
    if num_targets is not None:
        max_ids = max_ids - num_targets.reshape(B, 1, 1).astype(jnp.int32)
        ids_b = jnp.minimum(ids[:, None, :], max_ids)  # [B, 1, N] clamped per batch
        row_ids = jnp.broadcast_to(jnp.swapaxes(ids_b, 1, 2), (B, N, N))
        col_ids = jnp.broadcast_to(ids_b, (B, N, N))
    else:
        row_ids = jnp.broadcast_to(ids.reshape(1, N, 1), (B, N, N))
        col_ids = jnp.broadcast_to(ids.reshape(1, 1, N), (B, N, N))
    row_col_dist = row_ids - col_ids
    if not causal:
        row_col_dist = jnp.abs(row_col_dist)
    valid = jnp.logical_or(
        jnp.eye(N, dtype=jnp.bool_)[None, :, :], row_col_dist > 0
    )
    if max_attn_len > 0:
        window = row_col_dist <= max_attn_len
        if min_full_attn_seq_len > 0:
            window = jnp.logical_or(
                window, row_ids >= max_ids - min_full_attn_seq_len
            )
        valid = jnp.logical_and(valid, window)
    if contextual_seq_len > 0:
        valid = jnp.logical_or(
            valid, jnp.logical_and(row_ids == 0, col_ids < max_ids)
        )
    return valid


def apply_padding_guard(
    valid: jax.Array,  # bool[B, N, N]
    seq_lengths: jax.Array,  # int[B]
) -> jax.Array:
    """AND the spec mask with row/col < length (the Pallas kernel applies
    this internally). In the jagged spec the padded k/v are zero so the
    guard is a no-op there; in the padded production path (STULayer) the
    pad positions carry real projections of id-0 tokens and must be masked."""
    B, N, _ = valid.shape
    pos = jnp.arange(N, dtype=jnp.int32)
    in_len_col = pos[None, None, :] < seq_lengths.reshape(B, 1, 1)
    in_len_row = pos[None, :, None] < seq_lengths.reshape(B, 1, 1)
    return jnp.logical_and(valid, jnp.logical_and(in_len_col, in_len_row))


def make_causal_mask(N: int, dtype=jnp.float32) -> jax.Array:
    """Lower-triangular (inclusive) [N, N] mask used by the research-stack models
    (`research/modeling/sequential/hstu.py:626-638`: 1 - triu(ones, 1))."""
    return jnp.tril(jnp.ones((N, N), dtype=dtype))


def make_delta_attn_mask(
    N: int,
    seq_lengths: jax.Array,  # int[B] — full (cache + delta) lengths
    row_positions: jax.Array,  # int[B, M] — absolute query positions
    causal: bool = True,
    num_targets: Optional[jax.Array] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    min_full_attn_seq_len: int = 0,
) -> jax.Array:
    """Rows [b, row_positions[b, m], :] of `make_valid_attn_mask` computed
    directly as bool[B, M, N] — the M-FALCON delta path needs only the M
    newest rows, and materializing the full [B, N, N] mask to slice them
    (`pt_hstu_attention.py:213-232`) is O(N^2) memory per example."""
    B, M = row_positions.shape
    cols = jnp.arange(N, dtype=jnp.int32)[None, None, :]  # [1, 1, N]
    rows_raw = row_positions.astype(jnp.int32)[:, :, None]  # [B, M, 1]
    max_ids = seq_lengths.reshape(B, 1, 1).astype(jnp.int32)
    rows, col_ids = rows_raw, cols
    if contextual_seq_len > 0:
        rows = jnp.maximum(rows - contextual_seq_len + 1, 0)
        col_ids = jnp.maximum(cols - contextual_seq_len + 1, 0)
        max_ids = max_ids - contextual_seq_len + 1
    if num_targets is not None:
        max_ids = max_ids - num_targets.reshape(B, 1, 1).astype(jnp.int32)
        rows = jnp.minimum(rows, max_ids)
        col_ids = jnp.minimum(col_ids, max_ids)
    dist = rows - col_ids
    if not causal:
        dist = jnp.abs(dist)
    valid = jnp.logical_or(dist > 0, rows_raw == cols)
    if max_attn_len > 0:
        window = dist <= max_attn_len
        if min_full_attn_seq_len > 0:
            window = jnp.logical_or(
                window, rows >= max_ids - min_full_attn_seq_len
            )
        valid = jnp.logical_and(valid, window)
    if contextual_seq_len > 0:
        valid = jnp.logical_or(
            valid, jnp.logical_and(rows == 0, col_ids < max_ids)
        )
    return valid
