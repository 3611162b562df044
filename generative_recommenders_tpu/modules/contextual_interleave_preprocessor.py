"""Contextual-interleave input preprocessor (production stack), padded-dense.

TPU twin of `modules/contextual_interleave_preprocessor.py:37-357`
(ContextualInterleavePreprocessor): content and action encoders run through
(optionally parameterized/contextualized) MLPs; with ``enable_interleaving``
the two streams are INTERLEAVED as [c0, a0, c1, a1, ...] instead of summed.
During training targets are interleaved too (`interleave_targets`,
:101-106); at inference target positions keep only their content token
(:107-127 — the jagged mask-compaction there becomes a static gather here).

Padded math for the inference compaction: output slot q of row b reads
  q < 2*uih_len[b]          -> (content|action)[q // 2] by q parity
  q >= 2*uih_len[b]         -> content[uih_len[b] + (q - 2*uih_len[b])]
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.modules.action_encoder import (
    ActionEncoder,
    ContentEncoder,
)
from generative_recommenders_tpu.modules.contextualize_mlps import (
    ParameterizedContextualizedMLP,
    SimpleContextualizedMLP,
)
from generative_recommenders_tpu.modules.preprocessors import (
    PreprocessorOutput,
)
from generative_recommenders_tpu.ops.padded import prepend_prefix


class ContextualInterleavePreprocessor(nn.Module):
    input_embedding_dim: int
    output_embedding_dim: int
    contextual_feature_to_max_length: Tuple[Tuple[str, int], ...]
    contextual_feature_to_min_uih_length: Tuple[Tuple[str, int], ...]
    content_encoder: ContentEncoder
    action_encoder: ActionEncoder
    use_parameterized_mlps: bool = False
    mlp_hidden_dim: int = 256
    pmlp_contextual_dropout_ratio: float = 0.0
    enable_interleaving: bool = True

    @property
    def max_contextual_seq_len(self) -> int:
        return sum(l for _, l in self.contextual_feature_to_max_length)

    def interleave_targets(self) -> bool:
        # resolved with `deterministic` at call time (train-only, :356)
        return self.enable_interleaving

    def setup(self) -> None:
        C = self.max_contextual_seq_len
        mlp_cls = (
            ParameterizedContextualizedMLP
            if self.use_parameterized_mlps
            else SimpleContextualizedMLP
        )
        kwargs = dict(
            sequential_output_dim=self.output_embedding_dim,
            hidden_dim=self.mlp_hidden_dim,
        )
        if self.use_parameterized_mlps:
            self._content_mlp = ParameterizedContextualizedMLP(
                sequential_input_dim=self.content_encoder.output_embedding_dim,
                **kwargs, name="content_mlp",
            )
            self._action_mlp = ParameterizedContextualizedMLP(
                sequential_input_dim=self.action_encoder.output_embedding_dim,
                **kwargs, name="action_mlp",
            )
        else:
            self._content_mlp = SimpleContextualizedMLP(
                **kwargs, name="content_mlp"
            )
            self._action_mlp = SimpleContextualizedMLP(
                **kwargs, name="action_mlp"
            )
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
        deterministic: bool = True,
    ) -> PreprocessorOutput:
        B, N, _ = seq_embeddings.shape
        C = self.max_contextual_seq_len

        ctx_tokens = None
        pmlp_ctx = None
        if C > 0:
            min_lens = dict(self.contextual_feature_to_min_uih_length)
            parts = []
            for name, max_len in self.contextual_feature_to_max_length:
                v = seq_payloads[name].astype(seq_embeddings.dtype)
                v = v.reshape(B, max_len, self.input_embedding_dim)
                m = min_lens.get(name, 0)
                if m > 0:
                    v = v * (seq_lengths[:, None, None] >= m).astype(v.dtype)
                parts.append(v)
            ctx_in = jnp.concatenate(parts, axis=1)  # [B, C, Din]
            if self.use_parameterized_mlps:
                pmlp_ctx = ctx_in.reshape(B, C * self.input_embedding_dim)
                if not deterministic and self.pmlp_contextual_dropout_ratio > 0:
                    keep = jax.random.bernoulli(
                        self.make_rng("dropout"),
                        1.0 - self.pmlp_contextual_dropout_ratio,
                        pmlp_ctx.shape,
                    )
                    pmlp_ctx = jnp.where(
                        keep,
                        pmlp_ctx / (1.0 - self.pmlp_contextual_dropout_ratio),
                        0.0,
                    )
            ctx_tokens = (
                jnp.einsum(
                    "bcd,cde->bce", ctx_in, self._ctx_w,
                    preferred_element_type=jnp.float32,
                )
                + self._ctx_b[None]
            ).astype(seq_embeddings.dtype)

        content = self._content_mlp(
            self.content_encoder(seq_embeddings, uih_lengths, seq_payloads),
            pmlp_ctx,
        )
        action = self._action_mlp(
            self.action_encoder(uih_lengths, seq_lengths, seq_payloads),
            pmlp_ctx,
        )

        if not self.enable_interleaving:
            out = content + action
            out_ts = seq_timestamps
            out_lengths = seq_lengths
            out_uih_lengths = uih_lengths
            out_num_targets = num_targets
        else:
            ilv_targets = not deterministic  # interleave_targets (:356)
            Nout = 2 * N
            q = jnp.arange(Nout, dtype=jnp.int32)[None, :]  # [1, 2N]
            if ilv_targets:
                seq_pos = jnp.broadcast_to(q // 2, (B, Nout))
                which = jnp.broadcast_to(q % 2, (B, Nout))
                out_lengths = seq_lengths * 2
                out_uih_lengths = uih_lengths * 2
                out_num_targets = num_targets * 2
            else:
                two_uih = 2 * uih_lengths[:, None]
                is_pair = q < two_uih
                seq_pos = jnp.where(
                    is_pair, q // 2, uih_lengths[:, None] + (q - two_uih)
                )
                which = jnp.where(is_pair, q % 2, 0)
                out_lengths = 2 * uih_lengths + num_targets
                out_uih_lengths = uih_lengths * 2
                out_num_targets = num_targets
            seq_pos = jnp.clip(seq_pos, 0, N - 1)
            gat = lambda a: jnp.take_along_axis(
                a, seq_pos[..., None], axis=1
            )
            out = jnp.where((which == 0)[..., None], gat(content), gat(action))
            valid = q < out_lengths[:, None]
            out = out * valid[..., None].astype(out.dtype)
            out_ts = jnp.take_along_axis(seq_timestamps, seq_pos, axis=1)
            out_ts = jnp.where(valid, out_ts, 0)

        if C > 0:
            out = prepend_prefix(out, ctx_tokens)
            out_ts = prepend_prefix(
                out_ts, jnp.zeros((B, C), out_ts.dtype)
            )
            out_lengths = out_lengths + C
            out_uih_lengths = out_uih_lengths + C

        return PreprocessorOutput(
            seq_embeddings=out,
            seq_lengths=out_lengths,
            seq_timestamps=out_ts,
            uih_lengths=out_uih_lengths,
            num_targets=out_num_targets,
            contextual_seq_len=C,
        )
