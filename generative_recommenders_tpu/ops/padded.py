"""Padded-dense analogues of the reference's jagged concat/split ops.

The production stack (DlrmHSTU) manipulates merged [uih | candidates]
sequences. The reference does this with `concat_2D_jagged` / `split_2D_jagged`
(`ops/jagged_tensors.py:55-147`); in the padded [B, N, ...] layout those
become scatter/gather at per-row offsets — static shapes, XLA-friendly.

Row layout convention: row b holds uih tokens at [0, uih_lengths[b]),
candidates at [uih_lengths[b], uih_lengths[b] + num_candidates[b]), zeros
after.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def concat_tail(
    uih: jax.Array,  # [B, Nu, ...] or [B, Nu]
    uih_lengths: jax.Array,  # int[B]
    tail: jax.Array,  # [B, M, ...]
) -> jax.Array:
    """Padded `concat_2D_jagged` (`ops/jagged_tensors.py:55`): appends the
    dense tail rows at each row's jagged end. Output [B, Nu + M, ...]."""
    B, Nu = uih.shape[:2]
    M = tail.shape[1]
    pad_spec = [(0, 0), (0, M)] + [(0, 0)] * (uih.ndim - 2)
    out = jnp.pad(uih, pad_spec)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    cols = uih_lengths.astype(jnp.int32)[:, None] + jnp.arange(
        M, dtype=jnp.int32
    )[None, :]
    return out.at[rows, cols].set(tail.astype(out.dtype))


def gather_tail(
    seq: jax.Array,  # [B, N, ...]
    uih_lengths: jax.Array,  # int[B] — tail starts at uih_lengths[b]
    max_tail: int,
) -> jax.Array:
    """Padded `split_2D_jagged` right half (`ops/jagged_tensors.py:93`):
    gathers max_tail positions starting at each row's uih length."""
    B, N = seq.shape[:2]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    cols = uih_lengths.astype(jnp.int32)[:, None] + jnp.arange(
        max_tail, dtype=jnp.int32
    )[None, :]
    cols = jnp.clip(cols, 0, N - 1)
    return seq[rows, cols]


def prepend_prefix(
    seq: jax.Array,  # [B, N, ...]
    prefix: jax.Array,  # [B, C, ...] — dense, every row gets all C tokens
) -> jax.Array:
    """Padded `concat_2D_jagged` with dense left (contextual-token prepend,
    `modules/preprocessors.py:238-299`). Output [B, C + N, ...]."""
    return jnp.concatenate([prefix.astype(seq.dtype), seq], axis=1)


def valid_mask(lengths: jax.Array, N: int) -> jax.Array:
    """bool[B, N] — position < length."""
    return (
        jnp.arange(N, dtype=jnp.int32)[None, :]
        < lengths.astype(jnp.int32)[:, None]
    )
