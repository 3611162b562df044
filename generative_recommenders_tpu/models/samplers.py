"""Negatives samplers for autoregressive losses.

TPU twin of `research/modeling/sequential/autoregressive_losses.py:29-203`.
Samplers are pure functions over explicit state (no mutable modules):
``process_batch``-style caching becomes a returned ``InBatchState``.

The reference's dedup (torch.unique) is dynamic-shaped; here we sort ids,
mark first occurrences, compact them to the front of a fixed-size buffer and
sample uniformly from the (traced) unique count — identical distribution,
static shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def maybe_l2_norm(x: jax.Array, l2_norm: bool, eps: float) -> jax.Array:
    """x / max(||x||, eps) — clamped BEFORE the sqrt so the gradient at x == 0
    (padding embeddings) is finite. Values identical to the reference's
    x / clamp(norm, min=eps) (`autoregressive_losses.py:39-45`)."""
    if not l2_norm:
        return x
    sum_sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sum_sq, eps * eps))
    return x / norm


class LocalNegativesSampler(NamedTuple):
    """Uniform sampling over the full corpus (`autoregressive_losses.py:73-121`)."""

    all_item_ids: jax.Array  # int[X]
    l2_norm: bool
    l2_norm_eps: float

    def __call__(
        self,
        rng: jax.Array,
        positive_ids: jax.Array,  # int[...]
        num_to_sample: int,
        item_embedding_fn,
    ) -> Tuple[jax.Array, jax.Array]:
        shape = positive_ids.shape + (num_to_sample,)
        offsets = jax.random.randint(rng, shape, 0, self.all_item_ids.shape[0])
        sampled_ids = jnp.take(self.all_item_ids, offsets, axis=0)
        emb = maybe_l2_norm(item_embedding_fn(sampled_ids), self.l2_norm, self.l2_norm_eps)
        return sampled_ids, emb

    def normalize_embeddings(self, x: jax.Array) -> jax.Array:
        return maybe_l2_norm(x, self.l2_norm, self.l2_norm_eps)


class InBatchState(NamedTuple):
    ids: jax.Array  # int[M] — cached (maybe deduped) ids, valid in [0, count)
    embeddings: jax.Array  # [M, D]
    count: jax.Array  # int[] — traced number of valid entries


class InBatchNegativesSampler(NamedTuple):
    """In-batch sampling with optional dedup (`autoregressive_losses.py:124-203`)."""

    l2_norm: bool
    l2_norm_eps: float
    dedup_embeddings: bool

    def process_batch(
        self,
        ids: jax.Array,  # int[M]
        presences: jax.Array,  # bool[M]
        embeddings: jax.Array,  # [M, D]
    ) -> InBatchState:
        M = ids.shape[0]
        if self.dedup_embeddings:
            sentinel = jnp.iinfo(jnp.int32).max
            keyed = jnp.where(presences, ids.astype(jnp.int32), sentinel)
            order = jnp.argsort(keyed)
            sorted_ids = jnp.take(keyed, order, axis=0)
            prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_ids[:-1]])
            is_first = jnp.logical_and(sorted_ids != prev, sorted_ids != sentinel)
            count = jnp.sum(is_first).astype(jnp.int32)
            dest = jnp.where(is_first, jnp.cumsum(is_first) - 1, M)  # M == dropped
            unique_ids = (
                jnp.zeros((M,), jnp.int32).at[dest].set(sorted_ids, mode="drop")
            )
            sorted_emb = jnp.take(embeddings, order, axis=0)
            unique_emb = (
                jnp.zeros_like(embeddings).at[dest].set(sorted_emb, mode="drop")
            )
            return InBatchState(
                ids=unique_ids.astype(ids.dtype),
                embeddings=maybe_l2_norm(unique_emb, self.l2_norm, self.l2_norm_eps),
                count=count,
            )
        else:
            # Compact valid entries to the front preserving order.
            dest = jnp.where(presences, jnp.cumsum(presences) - 1, M)
            compact_ids = jnp.zeros((M,), ids.dtype).at[dest].set(ids, mode="drop")
            compact_emb = (
                jnp.zeros_like(embeddings).at[dest].set(embeddings, mode="drop")
            )
            return InBatchState(
                ids=compact_ids,
                embeddings=maybe_l2_norm(compact_emb, self.l2_norm, self.l2_norm_eps),
                count=jnp.sum(presences).astype(jnp.int32),
            )

    def __call__(
        self,
        rng: jax.Array,
        state: InBatchState,
        positive_ids: jax.Array,
        num_to_sample: int,
    ) -> Tuple[jax.Array, jax.Array]:
        shape = positive_ids.shape + (num_to_sample,)
        offsets = jax.random.randint(rng, shape, 0, jnp.maximum(state.count, 1))
        return (
            jnp.take(state.ids, offsets, axis=0),
            jnp.take(state.embeddings, offsets, axis=0),
        )

    def normalize_embeddings(self, x: jax.Array) -> jax.Array:
        return maybe_l2_norm(x, self.l2_norm, self.l2_norm_eps)
