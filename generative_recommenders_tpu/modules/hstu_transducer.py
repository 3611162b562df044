"""HSTUTransducer (production stack), padded-dense.

TPU twin of `modules/hstu_transducer.py:55-323`: input preprocessor →
positional encoder → input dropout → STU stack → gather candidate
embeddings → output postprocessor. `listwise` disables target-aware masking
during training; `return_full_embeddings` returns the postprocessed full
sequence too.

M-FALCON serving path: `prefill` runs the uih prefix once and returns the
per-layer KV caches; `cached_score` scores candidate chunks against those
caches via delta attention (`stu.py:354-418` + the candidate-append trick
of `dlrm_v3/inference/model_family.py` — max_num_candidates_inference
candidates per pass).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.modules.positional_encoder import (
    HSTUPositionalEncoder,
)
from generative_recommenders_tpu.modules.preprocessors import (
    ContextualPreprocessor,
    PreprocessorOutput,
)
from generative_recommenders_tpu.modules.stu import KVCache, STUStack
from generative_recommenders_tpu.ops.padded import gather_tail


class HSTUTransducer(nn.Module):
    stu_module: STUStack
    input_preprocessor: ContextualPreprocessor
    output_postprocessor: Optional[nn.Module] = None  # defaults to L2 norm
    positional_encoder: Optional[HSTUPositionalEncoder] = None
    input_dropout_ratio: float = 0.0
    return_full_embeddings: bool = False
    listwise: bool = False

    def _postprocess(self, emb: jax.Array, ts: jax.Array) -> jax.Array:
        if self.output_postprocessor is not None:
            return self.output_postprocessor(emb, ts)
        norm = jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)
        return emb / norm

    @nn.compact
    def __call__(
        self,
        seq_embeddings: jax.Array,  # [B, N, Din] merged uih|candidates
        seq_lengths: jax.Array,  # int[B]
        seq_timestamps: jax.Array,  # [B, N]
        uih_lengths: jax.Array,  # int[B]
        num_targets: jax.Array,  # int[B]
        seq_payloads: Dict[str, jax.Array],
        max_targets: int,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Returns (candidate_embeddings [B, max_targets, D],
        full_embeddings [B, C+N, D] or None)."""
        pre: PreprocessorOutput = self.input_preprocessor(
            seq_embeddings,
            seq_lengths,
            seq_timestamps,
            uih_lengths,
            num_targets,
            seq_payloads,
        )
        x = pre.seq_embeddings
        nt = None if (self.listwise and not deterministic) else pre.num_targets
        if self.positional_encoder is not None:
            x = self.positional_encoder(
                x, pre.seq_lengths, pre.seq_timestamps, nt
            )
        x = nn.Dropout(self.input_dropout_ratio)(
            x, deterministic=deterministic
        )
        encoded = self.stu_module(
            x, pre.seq_lengths, nt, deterministic
        )  # [B, C+N, D]

        full = None
        if self.return_full_embeddings:
            full = self._postprocess(encoded, pre.seq_timestamps)
        cand = gather_tail(encoded, pre.uih_lengths, max_targets)
        cand_ts = gather_tail(pre.seq_timestamps, pre.uih_lengths, max_targets)
        if not self.return_full_embeddings:
            cand = self._postprocess(cand, cand_ts)
        return cand, full

    # ------------------------------------------------------- M-FALCON path
    def prefill(
        self,
        uih_embeddings: jax.Array,  # [B, Nu, Din]
        uih_lengths: jax.Array,  # int[B]
        uih_timestamps: jax.Array,  # [B, Nu]
        query_time: jax.Array,  # int[B] — candidates' query time
        seq_payloads: Dict[str, jax.Array],
    ) -> Tuple[List[KVCache], jax.Array]:
        """Encode the uih prefix once, returning per-layer KV caches (and the
        contextual-shifted uih lengths)."""
        B = uih_embeddings.shape[0]
        pre = self.input_preprocessor(
            uih_embeddings,
            uih_lengths,
            uih_timestamps,
            uih_lengths,
            jnp.zeros((B,), jnp.int32),
            seq_payloads,
        )
        x = pre.seq_embeddings
        if self.positional_encoder is not None:
            # no targets in the prefix; time buckets reference the query time
            # exactly like the full pass does (`pt_position.py:108-111`)
            x = self.positional_encoder(
                x, pre.seq_lengths, pre.seq_timestamps, None, query_time
            )
        _, caches = self.stu_module(
            x, pre.seq_lengths, None, True, kv_caching_lengths=pre.seq_lengths
        )
        return caches, pre.seq_lengths

    def cached_score(
        self,
        cand_embeddings: jax.Array,  # [B, m, Din] — candidate chunk
        cand_timestamps: jax.Array,  # [B, m] (query time per candidate)
        caches: List[KVCache],
        query_time: jax.Array,  # int[B]
    ) -> jax.Array:
        """Scores one candidate chunk against the prefilled caches; returns
        postprocessed candidate embeddings [B, m, D]."""
        B, m, _ = cand_embeddings.shape
        x = self.input_preprocessor.delta_candidates(cand_embeddings)
        if self.positional_encoder is not None:
            x = self.positional_encoder.delta(x, cand_timestamps, query_time)
        nt = jnp.full((B,), m, jnp.int32)
        delta_out, _ = self.stu_module.cached_forward(x, caches, nt, True)
        return self._postprocess(delta_out, cand_timestamps)
