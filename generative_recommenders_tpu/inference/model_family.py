"""Serving model family: sparse (quantized embedding) + dense split.

TPU twin of `dlrm_v3/inference/model_family.py`:
  * ModelFamilySparseDist (:111-178): int8 dynamic-quantized
    EmbeddingCollection — here per-row absmax int8 tables with f32 scales,
    dequantized at lookup;
  * ModelFamilyDenseDist (:181-357): the dense DlrmHSTU main_forward — the
    reference spawns one process per GPU fed over mp.Queues; on TPU the
    jitted dense step drives the chip directly (XLA owns the pipelining), so
    the queue/worker machinery collapses into one jitted call;
  * HSTUModelFamily.predict (:88-108): sparse → dense pipeline. Also exposes
    the M-FALCON cached path (prefill + chunked candidate scoring).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from generative_recommenders_tpu.modules.dlrm_hstu import (
    DlrmHSTU,
    lookup_and_merge_features,
)

logger = logging.getLogger(__name__)


def quantize_table(table: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Row-wise absmax int8 quantization (torchrec quant-EC analogue)."""
    scale = jnp.maximum(jnp.max(jnp.abs(table), axis=1, keepdims=True), 1e-8)
    q = jnp.clip(jnp.round(table / scale * 127.0), -127, 127).astype(jnp.int8)
    return q, (scale / 127.0).astype(jnp.float32)


class HSTUModelFamily:
    """Bound (model, params) with a sparse/dense predict pipeline."""

    def __init__(
        self,
        model: DlrmHSTU,
        params: Any,
        quantize: bool = True,
        mesh: Optional[Any] = None,
    ) -> None:
        """``mesh``: serve data-parallel across a device mesh — params and
        quantized tables replicated, every request batch sharded on dim 0,
        one jitted step spanning all chips (the multi-chip serving topology;
        the reference runs one worker process per GPU behind mp.Queue RPC,
        `dlrm_v3/inference/model_family.py:181-357` — on TPU GSPMD turns the
        same jitted step into the SPMD program)."""
        self.model = model
        self.cfg = model.cfg
        self.mesh = mesh
        self._dense_params = params
        p = params["params"] if "params" in params else params
        self._feature_to_table: Dict[str, str] = {}
        for t in model.embedding_tables:
            for f in t.feature_names:
                self._feature_to_table[f] = t.name
        self._quantized = quantize
        self._tables: Dict[str, Any] = {}
        for t in model.embedding_tables:
            w = p[f"embedding_tables_{t.name}"]
            self._tables[t.name] = quantize_table(w) if quantize else w
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._dense_params = jax.device_put(self._dense_params, rep)
            self._tables = jax.device_put(self._tables, rep)
            self._batch_sharding = NamedSharding(
                mesh, P(tuple(mesh.axis_names))
            )
        self._sparse = jax.jit(self._sparse_impl)
        self._dense = jax.jit(self._dense_impl)
        self._prefill = jax.jit(self._prefill_impl)
        self._score_chunk = jax.jit(self._score_chunk_impl)

    def shard_inputs(self, tree: Any) -> Any:
        """Lays request batches out over the serving mesh (dim 0 sharded
        across every mesh axis). No-op without a mesh."""
        if self.mesh is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self._batch_sharding),
            tree,
        )

    # ---------------------------------------------------------- sparse stage
    def _lookup(self, feature: str, ids: jax.Array) -> jax.Array:
        t = self._tables[self._feature_to_table[feature]]
        idx = ids.astype(jnp.int32)
        if self._quantized:
            q, scale = t
            return jnp.take(q, idx, axis=0).astype(jnp.float32) * jnp.take(
                scale, idx, axis=0
            )
        return jnp.take(t, idx, axis=0)

    def _sparse_impl(self, uih_features, uih_lengths, candidates_features):
        return lookup_and_merge_features(
            self.cfg,
            self._feature_to_table,
            self._lookup,
            uih_features,
            uih_lengths,
            candidates_features,
        )

    # ----------------------------------------------------------- dense stage
    def _dense_impl(
        self, seq_embeddings, payload_features, uih_lengths, num_candidates
    ):
        _, _, _, preds, _, _ = self.model.apply(
            self._dense_params,
            seq_embeddings,
            payload_features,
            uih_lengths,
            num_candidates,
            True,  # deterministic
            False,  # compute_losses
            method=DlrmHSTU.main_forward,
        )
        return preds

    def predict(
        self, uih_features, uih_lengths, candidates_features, num_candidates
    ) -> jax.Array:
        """sparse → dense (`model_family.py:88-108`). Returns [T, B, M].
        With a serving mesh, the batch is sharded on dim 0 and the whole
        pipeline runs SPMD across the mesh."""
        if self.mesh is not None:
            uih_features, uih_lengths, candidates_features, num_candidates = (
                self.shard_inputs(
                    (uih_features, uih_lengths, candidates_features,
                     num_candidates)
                )
            )
        seq_embeddings, payloads = self._sparse(
            uih_features, uih_lengths, candidates_features
        )
        return self._dense(seq_embeddings, payloads, uih_lengths, num_candidates)

    # ------------------------------------------------------- M-FALCON cached
    def _prefill_impl(self, uih_features, uih_lengths, query_time):
        return self.model.apply(
            self._dense_params, uih_features, uih_lengths, query_time,
            method=DlrmHSTU.mfalcon_prefill,
        )

    def _score_chunk_impl(self, caches, cand_chunk, query_time):
        return self.model.apply(
            self._dense_params, caches, cand_chunk, query_time,
            method=DlrmHSTU.mfalcon_score_chunk,
        )

    def predict_mfalcon(
        self,
        uih_features,
        uih_lengths,
        candidates_features,
        query_time,
        microbatch: Optional[int] = None,
    ) -> jax.Array:
        """KV-cached microbatched scoring: prefill once, score candidate
        chunks of `max_num_candidates_inference` (`dlrm_v3/inference`'s
        M-FALCON trick). Returns [T, B, M]."""
        m = microbatch or self.cfg.max_num_candidates_inference
        caches, _ = self._prefill(uih_features, uih_lengths, query_time)
        M = next(iter(candidates_features.values())).shape[1]
        preds = []
        for c0 in range(0, M, m):
            chunk = {
                k: v[:, c0 : c0 + m] for k, v in candidates_features.items()
            }
            preds.append(self._score_chunk(caches, chunk, query_time))
        return jnp.concatenate(preds, axis=-1)
