"""Jagged-tensor library for TPU (pure JAX / XLA).

A jagged tensor is a pair ``(values, offsets)`` where ``values`` has a *static*
leading dimension ``L`` (a compile-time capacity, typically ``B * max_len``)
and ``offsets`` is an ``int32[B + 1]`` exclusive-scan of the per-row lengths.
Slots past ``offsets[-1]`` are padding and every op here treats them as
"don't care" (they are zero-filled on produce and ignored on consume).

This replaces the reference's fbgemm jagged ops + ``ops/triton/triton_jagged*.py``
+ ``ops/cpp/{complete_cumsum,concat_1d_jagged_jagged,expand_1d_jagged_to_dense}``
(see reference `generative_recommenders/ops/jagged_tensors.py:55-210`).  On TPU,
XLA wants static shapes, so the dynamic total length lives in ``offsets[-1]``
while shapes carry the capacity; gathers/scatters below are all O(L) and fuse
into surrounding computation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class JaggedTensor(NamedTuple):
    """values: [L, ...] with static capacity L; offsets: int32[B + 1]."""

    values: jax.Array
    offsets: jax.Array

    @property
    def num_rows(self) -> int:
        return self.offsets.shape[0] - 1

    def lengths(self) -> jax.Array:
        return self.offsets[1:] - self.offsets[:-1]


def lengths_to_offsets(lengths: jax.Array) -> jax.Array:
    """Exclusive scan producing int32[B + 1] offsets from int lengths[B].

    TPU-native twin of fbgemm ``asynchronous_complete_cumsum`` and the
    reference C++ op `ops/cpp/complete_cumsum.cpp`.
    """
    lengths = lengths.astype(jnp.int32)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lengths, dtype=jnp.int32)]
    )


def offsets_to_lengths(offsets: jax.Array) -> jax.Array:
    return offsets[1:] - offsets[:-1]


def row_ids_from_offsets(offsets: jax.Array, total: int) -> jax.Array:
    """For each flat slot l in [0, total), the row b such that
    offsets[b] <= l < offsets[b + 1].  Slots >= offsets[-1] map to B - 1."""
    slot = jnp.arange(total, dtype=jnp.int32)
    b = jnp.searchsorted(offsets, slot, side="right").astype(jnp.int32) - 1
    return jnp.clip(b, 0, offsets.shape[0] - 2)


def jagged_to_padded_dense(
    values: jax.Array,
    offsets: jax.Array,
    max_len: int,
    padding_value: float = 0.0,
) -> jax.Array:
    """[L, ...] jagged -> [B, max_len, ...] dense (fbgemm jagged_to_padded_dense).

    Rows shorter than ``max_len`` are padded with ``padding_value``; longer rows
    are truncated.
    """
    B = offsets.shape[0] - 1
    L = values.shape[0]
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]  # [1, max_len]
    src = offsets[:-1, None] + pos  # [B, max_len]
    valid = pos < (offsets[1:] - offsets[:-1])[:, None]
    gathered = jnp.take(values, jnp.clip(src, 0, L - 1), axis=0)
    mask_shape = (B, max_len) + (1,) * (values.ndim - 1)
    return jnp.where(
        valid.reshape(mask_shape),
        gathered,
        jnp.asarray(padding_value, dtype=values.dtype),
    )


def dense_to_jagged(
    dense: jax.Array,
    offsets: jax.Array,
    total: Optional[int] = None,
) -> jax.Array:
    """[B, N, ...] dense -> [total, ...] jagged values (fbgemm dense_to_jagged).

    ``total`` is the static capacity of the output (defaults to B * N); slots
    past ``offsets[-1]`` are zero-filled.
    """
    B, N = dense.shape[0], dense.shape[1]
    if total is None:
        total = B * N
    b = row_ids_from_offsets(offsets, total)
    slot = jnp.arange(total, dtype=jnp.int32)
    n = slot - offsets[b]
    valid = slot < offsets[-1]
    flat = dense.reshape((B * N,) + dense.shape[2:])
    idx = jnp.clip(b * N + jnp.clip(n, 0, N - 1), 0, B * N - 1)
    out = jnp.take(flat, idx, axis=0)
    mask_shape = (total,) + (1,) * (dense.ndim - 2)
    return jnp.where(valid.reshape(mask_shape), out, jnp.zeros((), dense.dtype))


def concat_2D_jagged(
    values_left: jax.Array,
    offsets_left: jax.Array,
    values_right: jax.Array,
    offsets_right: jax.Array,
    total: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-row concatenation of two jagged 2-D tensors.

    Mirrors reference ``concat_2D_jagged`` (`ops/jagged_tensors.py:55`):
    out row b = [left row b ++ right row b].  Returns (values, offsets).
    """
    if total is None:
        total = values_left.shape[0] + values_right.shape[0]
    len_l = offsets_to_lengths(offsets_left)
    out_offsets = lengths_to_offsets(len_l + offsets_to_lengths(offsets_right))
    b = row_ids_from_offsets(out_offsets, total)
    slot = jnp.arange(total, dtype=jnp.int32)
    pos = slot - out_offsets[b]
    from_left = pos < len_l[b]
    idx_l = jnp.clip(offsets_left[b] + pos, 0, values_left.shape[0] - 1)
    idx_r = jnp.clip(offsets_right[b] + pos - len_l[b], 0, values_right.shape[0] - 1)
    out = jnp.where(
        from_left[:, None],
        jnp.take(values_left, idx_l, axis=0),
        jnp.take(values_right, idx_r, axis=0),
    )
    valid = slot < out_offsets[-1]
    out = jnp.where(valid[:, None], out, jnp.zeros((), out.dtype))
    return out, out_offsets


def split_2D_jagged(
    values: jax.Array,
    offsets: jax.Array,
    offsets_left: jax.Array,
    offsets_right: jax.Array,
    total_left: int,
    total_right: int,
) -> Tuple[jax.Array, jax.Array]:
    """Inverse of :func:`concat_2D_jagged` (`ops/jagged_tensors.py:93`).

    Row b of the input holds len_l[b] "left" slots followed by len_r[b]
    "right" slots; returns the two jagged value tensors.
    """
    len_l = offsets_to_lengths(offsets_left)

    def gather(out_offsets: jax.Array, extra: jax.Array, total: int) -> jax.Array:
        b = row_ids_from_offsets(out_offsets, total)
        slot = jnp.arange(total, dtype=jnp.int32)
        pos = slot - out_offsets[b]
        src = jnp.clip(offsets[b] + extra[b] + pos, 0, values.shape[0] - 1)
        out = jnp.take(values, src, axis=0)
        valid = slot < out_offsets[-1]
        return jnp.where(valid[:, None], out, jnp.zeros((), out.dtype))

    zeros = jnp.zeros_like(len_l)
    vals_left = gather(offsets_left, zeros, total_left)
    vals_right = gather(offsets_right, len_l, total_right)
    return vals_left, vals_right


def concat_2D_jagged_dense_first(
    dense_left: jax.Array,
    values_right: jax.Array,
    offsets_right: jax.Array,
    total: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Concat a fixed-width dense prefix [B, P, D] with a jagged suffix.

    Mirrors the reference's dense-jagged concat used for contextual/prefix
    tokens (`ops/triton/triton_jagged_tensors.py:31-407`).
    """
    B, P, D = dense_left.shape
    left_offsets = jnp.arange(B + 1, dtype=jnp.int32) * P
    return concat_2D_jagged(
        dense_left.reshape(B * P, D), left_offsets, values_right, offsets_right, total
    )


def jagged_dense_bmm_broadcast_add(
    values: jax.Array,
    offsets: jax.Array,
    dense: jax.Array,
    bias: Optional[jax.Array] = None,
    max_len: Optional[int] = None,
) -> jax.Array:
    """Per-row matmul of jagged [L, D] with dense [B, D, K] (+ bias [B, K]).

    Mirrors reference ``jagged_dense_bmm_broadcast_add``
    (`ops/jagged_tensors.py:210`).  Routed through a padded-dense bmm so the
    contraction lands on the MXU.
    """
    B = offsets.shape[0] - 1
    if max_len is None:
        max_len = max(int(values.shape[0]) // max(B, 1), 1)
    padded = jagged_to_padded_dense(values, offsets, max_len)  # [B, N, D]
    out = jnp.einsum(
        "bnd,bdk->bnk", padded, dense, preferred_element_type=jnp.float32
    ).astype(values.dtype)
    if bias is not None:
        out = out + bias[:, None, :].astype(out.dtype)
    return dense_to_jagged(out, offsets, total=values.shape[0])


def jagged_reduce_sum(values: jax.Array, offsets: jax.Array) -> jax.Array:
    """Segment-sum of jagged values -> [B, ...] (reference triton_jagged.py:424)."""
    total = values.shape[0]
    b = row_ids_from_offsets(offsets, total)
    valid = jnp.arange(total, dtype=jnp.int32) < offsets[-1]
    masked = jnp.where(
        valid.reshape((total,) + (1,) * (values.ndim - 1)),
        values,
        jnp.zeros((), values.dtype),
    )
    return jax.ops.segment_sum(masked, b, num_segments=offsets.shape[0] - 1)


def jagged_boolean_mask_lengths(
    lengths: jax.Array, keep: jax.Array, max_len: int
) -> jax.Array:
    """Given dense keep-mask [B, N], new lengths after filtering (helper for
    seen-id filtering and stochastic-length sampling)."""
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    valid = pos < lengths[:, None]
    return jnp.sum(jnp.logical_and(keep, valid), axis=1).astype(jnp.int32)
