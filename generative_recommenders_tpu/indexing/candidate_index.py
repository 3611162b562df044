"""Candidate index + brute-force MIPS top-k retrieval.

TPU twin of `research/indexing/candidate_index.py:24-180`,
`research/indexing/mips_top_k.py` and the `TopKModule` interface
(`research/rails/indexing/candidate_index.py:23-41`).

`get_top_k_outputs` replicates the reference's over-fetch (k + N0) + row-wise
seen-id filtering, with the dynamic `nonzero` compaction replaced by a
static-shape "first-k-valid" selection (top_k over a validity-ranked key).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def mips_brute_force_top_k(
    query_embeddings: jax.Array,  # [B, D]
    item_embeddings: jax.Array,  # [X, D]
    item_ids: jax.Array,  # int[X]
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exhaustive max-inner-product top-k (`mips_top_k.py:40-81`).
    Returns (top_k_scores [B, k], top_k_ids [B, k])."""
    scores = jnp.einsum(
        "bd,xd->bx", query_embeddings, item_embeddings,
        preferred_element_type=jnp.float32,
    )
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, jnp.take(item_ids, top_idx, axis=0)


@dataclasses.dataclass
class CandidateIndex:
    """Holds the (1, X) candidate corpus (`candidate_index.py:24`)."""

    ids: jax.Array  # int[X] (positive)
    embeddings: jax.Array  # [X, D]

    @property
    def num_objects(self) -> int:
        return int(self.ids.shape[0])

    def get_top_k_outputs(
        self,
        query_embeddings: jax.Array,  # [B, D]
        k: int,
        invalid_ids: Optional[jax.Array] = None,  # int[B, N0]; >0 entries filtered
        top_k_module: Optional[Callable] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Top-k with row-wise invalid-id filtering
        (`candidate_index.py:112-174`). Returns (ids [B, k], scores [B, k])."""
        max_num_invalid = 0 if invalid_ids is None else invalid_ids.shape[1]
        k_prime = min(k + max_num_invalid, self.num_objects)
        top_k_fn = top_k_module or (
            lambda q, kk: mips_brute_force_top_k(q, self.embeddings, self.ids, kk)
        )
        top_scores, top_ids = top_k_fn(query_embeddings, k_prime)
        if invalid_ids is None:
            return top_ids[:, :k], top_scores[:, :k]
        is_valid = ~jnp.any(
            top_ids[:, :, None] == invalid_ids[:, None, :], axis=2
        )  # [B, k']
        # Select the first k valid entries per row, preserving score order:
        # rank key = valid * BIG - position (top_k of the key yields the first
        # k valid positions in ascending-position order).
        pos = jnp.arange(k_prime, dtype=jnp.int32)[None, :]
        key = is_valid.astype(jnp.int32) * (2 * k_prime) - pos
        _, sel = jax.lax.top_k(key, k)  # positions of first k valid, ascending
        sel = jnp.sort(sel, axis=1)
        return (
            jnp.take_along_axis(top_ids, sel, axis=1),
            jnp.take_along_axis(top_scores, sel, axis=1),
        )
