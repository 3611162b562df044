"""Input preprocessors (production stack), padded-dense.

TPU twin of `modules/preprocessors.py:108-299` (ContextualPreprocessor):
  * content MLP on item embeddings;
  * optional action encoder + action MLP, added in;
  * contextual features (e.g. user id/profile embeddings) run through
    per-position linear maps (the reference's baddbmm over a
    [C, Din, Dout] weight batch) and PREPENDED as C extra tokens.

Padded layout: returns sequences of length C + N with lengths/uih_lengths
shifted by C; timestamps get zero-prefixed.

`delta_candidates` is the M-FALCON incremental twin: preprocess a chunk of
candidate tokens alone (content MLP + learned target-action embedding),
matching exactly what the full pass would compute at candidate positions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.modules.action_encoder import ActionEncoder
from generative_recommenders_tpu.modules.mlp import SwishMLP
from generative_recommenders_tpu.ops.padded import prepend_prefix


@dataclasses.dataclass(frozen=True)
class PreprocessorOutput:
    seq_embeddings: jax.Array  # [B, C + N, Dout]
    seq_lengths: jax.Array  # int[B]
    seq_timestamps: jax.Array  # [B, C + N]
    uih_lengths: jax.Array  # int[B] (incl. contextual prefix)
    num_targets: jax.Array  # int[B]
    contextual_seq_len: int


class ContextualPreprocessor(nn.Module):
    input_embedding_dim: int
    output_embedding_dim: int
    contextual_feature_to_max_length: Tuple[Tuple[str, int], ...] = ()
    contextual_feature_to_min_uih_length: Tuple[Tuple[str, int], ...] = ()
    action_embedding_dim: int = 8
    action_feature_name: str = ""
    action_weights: Optional[Tuple[int, ...]] = None
    hidden_dim: int = 256

    @property
    def max_contextual_seq_len(self) -> int:
        return sum(l for _, l in self.contextual_feature_to_max_length)

    def interleave_targets(self) -> bool:
        return False

    def setup(self) -> None:
        self._content_mlp = SwishMLP(
            self.hidden_dim, self.output_embedding_dim, name="content_mlp"
        )
        if self.action_weights is not None:
            self._action_encoder = ActionEncoder(
                action_embedding_dim=self.action_embedding_dim,
                action_feature_name=self.action_feature_name,
                action_weights=tuple(self.action_weights),
                name="action_encoder",
            )
            self._action_mlp = SwishMLP(
                self.hidden_dim, self.output_embedding_dim, name="action_mlp"
            )
        C = self.max_contextual_seq_len
        if C > 0:
            std = (
                2.0 / (self.input_embedding_dim + self.output_embedding_dim)
            ) ** 0.5
            self._ctx_w = self.param(
                "batched_contextual_linear_weights",
                nn.initializers.normal(std),
                (C, self.input_embedding_dim, self.output_embedding_dim),
            )
            self._ctx_b = self.param(
                "batched_contextual_linear_bias",
                nn.initializers.zeros,
                (C, self.output_embedding_dim),
            )

    def __call__(
        self,
        seq_embeddings: jax.Array,  # [B, N, Din] merged uih|candidates
        seq_lengths: jax.Array,  # int[B]
        seq_timestamps: jax.Array,  # [B, N]
        uih_lengths: jax.Array,  # int[B]
        num_targets: jax.Array,  # int[B]
        seq_payloads: Dict[str, jax.Array],
    ) -> PreprocessorOutput:
        B, N, _ = seq_embeddings.shape
        out = self._content_mlp(seq_embeddings)

        if self.action_weights is not None:
            action_emb = self._action_encoder(
                uih_lengths, seq_lengths, seq_payloads
            )
            out = out + self._action_mlp(action_emb)

        C = self.max_contextual_seq_len
        if C > 0:
            # gather padded contextual inputs [B, C, Din]
            # (`preprocessors.py:81-104`: each feature padded to its max_len;
            # zeroed when the uih is shorter than min_uih_length)
            min_lens = dict(self.contextual_feature_to_min_uih_length)
            parts = []
            for name, max_len in self.contextual_feature_to_max_length:
                v = seq_payloads[name].astype(seq_embeddings.dtype)
                v = v.reshape(B, max_len, self.input_embedding_dim)
                min_uih = min_lens.get(name, 0)
                if min_uih > 0:
                    v = v * (
                        seq_lengths[:, None, None] >= min_uih
                    ).astype(v.dtype)
                parts.append(v)
            ctx_in = jnp.concatenate(parts, axis=1)  # [B, C, Din]
            ctx = (
                jnp.einsum(
                    "bcd,cde->bce", ctx_in, self._ctx_w,
                    preferred_element_type=jnp.float32,
                )
                + self._ctx_b[None]
            ).astype(out.dtype)
            out = prepend_prefix(out, ctx)
            seq_timestamps = prepend_prefix(
                seq_timestamps, jnp.zeros((B, C), seq_timestamps.dtype)
            )
            seq_lengths = seq_lengths + C
            uih_lengths = uih_lengths + C

        return PreprocessorOutput(
            seq_embeddings=out,
            seq_lengths=seq_lengths,
            seq_timestamps=seq_timestamps,
            uih_lengths=uih_lengths,
            num_targets=num_targets,
            contextual_seq_len=C,
        )

    def delta_candidates(
        self,
        cand_embeddings: jax.Array,  # [B, m, Din]
    ) -> jax.Array:
        """M-FALCON delta preprocessing of candidate tokens: content MLP +
        (target) action MLP — what `__call__` produces at candidate
        positions (no contextual/positional terms; the positional encoder
        handles those)."""
        out = self._content_mlp(cand_embeddings)
        if self.action_weights is not None:
            B, m, _ = cand_embeddings.shape
            target = self._action_encoder.target_embedding()  # [1, A*d]
            out = out + self._action_mlp(
                jnp.broadcast_to(target[None], (B, m, target.shape[-1]))
            )
        return out
