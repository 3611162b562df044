"""MoL brute-force top-k retrieval (RAILS indexing).

TPU twin of `research/rails/indexing/mol_top_k.py:35-133`
(MoLBruteForceTopK): scores the full corpus with the learned MoL similarity
in item microbatches (decoupled item components precomputed once), then
top-k. Plugs into `CandidateIndex.get_top_k_outputs` as ``top_k_module``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from generative_recommenders_tpu.models.rails.mol import MoLSimilarity
from generative_recommenders_tpu.models.sequential import SequentialRecommender


class MoLBruteForceTopK:
    """Bound to a trained model's params; precomputes item components."""

    def __init__(
        self,
        model: SequentialRecommender,
        params: Any,
        item_ids: jax.Array,  # int[X]
        item_embeddings: jax.Array,  # [X, Di] raw (pre-MoL) item embeddings
        item_chunk_size: int = 8192,
    ) -> None:
        self._model = model
        self._params = params
        self._ids = item_ids
        self._chunk = min(item_chunk_size, item_embeddings.shape[0])
        X = item_embeddings.shape[0]
        pad = (-X) % self._chunk
        padded = jnp.pad(item_embeddings, ((0, pad), (0, 0)))
        self._X = X
        self._i_comp, self._gi = model.apply(
            params, padded, method=SequentialRecommender.mol_item_components
        )

    def scores(
        self,
        query_embeddings: jax.Array,  # [B, Dq]
        user_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        apply = self._model.apply
        has_gi = self._gi is not None
        n_chunks = self._i_comp.shape[0] // self._chunk
        ic = self._i_comp.reshape(
            n_chunks, self._chunk, *self._i_comp.shape[1:]
        )
        g = (
            self._gi.reshape(n_chunks, self._chunk, -1)
            if has_gi
            else jnp.zeros((n_chunks, self._chunk, 1), jnp.float32)
        )

        def score_chunk(args):
            c_ic, c_g = args[0], (args[1] if has_gi else None)
            return apply(
                self._params, query_embeddings, c_ic, c_g, user_ids,
                method=SequentialRecommender.mol_score_components,
            )

        s = jax.lax.map(score_chunk, (ic, g))  # [n_chunks, B, chunk]
        return jnp.moveaxis(s, 0, 1).reshape(
            query_embeddings.shape[0], -1
        )[:, : self._X]

    def __call__(
        self, query_embeddings: jax.Array, k: int,
        user_ids: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """(top_k_scores [B, k], top_k_ids [B, k]) — TopKModule interface
        (`rails/indexing/candidate_index.py:23-41`)."""
        s = self.scores(query_embeddings, user_ids)
        top_scores, top_idx = jax.lax.top_k(s, k)
        return top_scores, jnp.take(self._ids, top_idx, axis=0)
