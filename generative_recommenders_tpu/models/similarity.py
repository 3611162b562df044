"""Similarity modules (research stack).

TPU twin of `research/rails/similarities/dot_product_similarity_fn.py:22-67`
and the `SimilarityModule` interface (`research/rails/similarities/module.py:21`).
MoL (mixture-of-logits) lives in `mol.py`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def dot_product_similarity(
    query_embeddings: jax.Array,  # [B, D] (or [B * r, D])
    item_embeddings: jax.Array,  # [1, X, D] or [B, X, D]
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Returns ([B, X] logits, aux_losses)."""
    B_i, X, D = item_embeddings.shape
    if B_i == 1:
        logits = query_embeddings @ item_embeddings[0].T
    elif query_embeddings.shape[0] != B_i:
        r = query_embeddings.shape[0] // B_i
        logits = jnp.einsum(
            "brd,bxd->brx", query_embeddings.reshape(B_i, r, D), item_embeddings
        ).reshape(-1, X)
    else:
        logits = jnp.einsum("bxd,bd->bx", item_embeddings, query_embeddings)
    return logits, {}
