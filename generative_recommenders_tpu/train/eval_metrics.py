"""Full-corpus retrieval eval: HR@k / NDCG@k / MRR with seen-id filtering.

TPU twin of `research/data/eval.py:46-264` (eval_metrics_v2_from_tensors).

The reference materializes a top-(k + N0) list and locates the target's rank;
here the rank is computed directly as

    rank(target) = 1 + #{valid items with score > score(target)}

which is identical up to float-tie ordering, avoids a top-2500 sort on TPU,
and keeps everything static-shaped. MAX_K capping (rank > k -> MAX_K + 1) and
the "target filtered as seen => miss" behavior are replicated exactly.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

MAX_K = 2500  # reference `eval.py:118`


def build_id_to_col(item_ids: np.ndarray, max_item_id: int) -> np.ndarray:
    """Lookup table mapping item id -> column in the corpus score matrix.
    Ids not in the corpus map to X (out-of-range sentinel)."""
    X = item_ids.shape[0]
    col = np.full((max_item_id + 2,), X, dtype=np.int32)
    col[item_ids] = np.arange(X, dtype=np.int32)
    return col


def ranks_from_scores(
    scores: jax.Array,  # [B, X] similarity scores over the corpus
    id_to_col: jax.Array,  # int32[max_id + 2]
    target_ids: jax.Array,  # int[B]
    past_ids: jax.Array,  # int[B, N]
    k: int,
) -> jax.Array:
    """Rank of each target given corpus scores; misses get MAX_K + 1.
    Used by both the dot-product and the MoL (RAILS) eval paths."""
    B, X = scores.shape
    tcol = jnp.take(id_to_col, target_ids, axis=0)  # [B]
    tscore = jnp.take_along_axis(
        scores, jnp.clip(tcol, 0, X - 1)[:, None], axis=1
    )[:, 0]
    seen_cols = jnp.where(
        past_ids > 0, jnp.take(id_to_col, past_ids, axis=0), X
    )  # [B, N]; X = drop
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], seen_cols.shape)
    scores = scores.at[rows, seen_cols].set(-jnp.inf, mode="drop")
    target_seen = jnp.any(
        jnp.logical_and(past_ids == target_ids[:, None], past_ids > 0), axis=1
    )
    rank = 1 + jnp.sum(scores > tscore[:, None], axis=1)
    rank = jnp.where(target_seen, MAX_K + 1, rank)
    rank = jnp.where(rank > k, MAX_K + 1, rank)
    return rank.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def target_ranks(
    query_embeddings: jax.Array,  # [B, D]
    item_embeddings: jax.Array,  # [X, D] (normalized like eval candidates)
    id_to_col: jax.Array,  # int32[max_id + 2]
    target_ids: jax.Array,  # int[B]
    past_ids: jax.Array,  # int[B, N] (0 = padding) — the seen ids to filter
    k: int,
) -> jax.Array:
    """Dot-product full-corpus rank (MIPS brute force, `mips_top_k.py:40-81`)."""
    scores = jnp.einsum(
        "bd,xd->bx", query_embeddings, item_embeddings,
        preferred_element_type=jnp.float32,
    )
    return ranks_from_scores(scores, id_to_col, target_ids, past_ids, k)


def metrics_from_ranks(
    ranks: jax.Array,  # int[B]
    target_ratings: Optional[jax.Array] = None,  # int[B]
    min_positive_rating: int = 4,
) -> Dict[str, jax.Array]:
    """Per-example metric values (`eval.py:165-215`). Rating-filtered variants
    are returned as (value, mask) handled by the aggregator."""
    r = ranks.astype(jnp.float32)
    dcg = jnp.where(ranks <= MAX_K, 1.0 / jnp.log2(r + 1.0), 0.0)
    out: Dict[str, jax.Array] = {}
    for kk in (1, 10, 50, 100, 200):
        out[f"ndcg@{kk}"] = jnp.where(ranks <= kk, dcg, 0.0)
    for kk in (1, 10, 50, 100, 200, 500, 1000):
        out[f"hr@{kk}"] = (ranks <= kk).astype(jnp.float32)
    out["mrr"] = 1.0 / r
    if target_ratings is not None:
        pos = (target_ratings >= min_positive_rating).astype(jnp.float32)
        out["_rating_mask"] = pos
        out[f"hr@10_>={min_positive_rating}"] = out["hr@10"]
        out[f"hr@50_>={min_positive_rating}"] = out["hr@50"]
        out[f"mrr_>={min_positive_rating}"] = out["mrr"]
        out["ndcg@10_>=4"] = out["ndcg@10"]
    return out


class MetricsAccumulator:
    """Host-side accumulation of per-example metrics across eval batches,
    with optional rating-filtered averaging (`eval.py:200-215,245-251`)."""

    def __init__(self) -> None:
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, float] = {}

    def update(self, metrics: Dict[str, jax.Array]) -> None:
        m = {k: np.asarray(v) for k, v in metrics.items()}
        mask = m.pop("_rating_mask", None)
        for key, vals in m.items():
            if "_>=" in key:
                assert mask is not None
                s, c = float((vals * mask).sum()), float(mask.sum())
            else:
                s, c = float(vals.sum()), float(vals.size)
            self._sums[key] = self._sums.get(key, 0.0) + s
            self._counts[key] = self._counts.get(key, 0.0) + c

    def compute(self) -> Dict[str, float]:
        return {
            k: (self._sums[k] / self._counts[k] if self._counts[k] else float("nan"))
            for k in self._sums
        }
