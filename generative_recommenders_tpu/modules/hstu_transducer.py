"""HSTUTransducer (production stack), padded-dense.

TPU twin of `modules/hstu_transducer.py:55-323`: input preprocessor →
positional encoder → input dropout → STU stack → gather candidate
embeddings → output postprocessor. `listwise` disables target-aware masking
during training; `return_full_embeddings` returns the postprocessed full
sequence too.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

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
from generative_recommenders_tpu.modules.stu import STUStack
from generative_recommenders_tpu.ops.padded import gather_tail


class HSTUTransducer(nn.Module):
    stu_module: STUStack
    input_preprocessor: ContextualPreprocessor
    output_postprocessor: Optional[nn.Module] = None  # defaults to L2 norm
    positional_encoder: Optional[HSTUPositionalEncoder] = None
    input_dropout_ratio: float = 0.0
    return_full_embeddings: bool = False
    listwise: bool = False

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

        post = self.output_postprocessor
        full = None
        if self.return_full_embeddings:
            full = post(encoded, pre.seq_timestamps) if post else encoded
        cand = gather_tail(encoded, pre.uih_lengths, max_targets)
        cand_ts = gather_tail(pre.seq_timestamps, pre.uih_lengths, max_targets)
        if not self.return_full_embeddings and post is not None:
            cand = post(cand, cand_ts)
        elif post is None:
            norm = jnp.maximum(
                jnp.linalg.norm(cand, axis=-1, keepdims=True), 1e-6
            )
            cand = cand / norm
        return cand, full
