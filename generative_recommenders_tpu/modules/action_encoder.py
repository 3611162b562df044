"""Action encoder (production stack), padded-dense.

TPU twin of `modules/action_encoder.py:27-112`: decodes per-event action
bitmasks into concatenated per-action-type embeddings (one-hot × table);
optional watchtime-threshold synthetic actions; candidate positions get a
learned target-action embedding instead (also exposed standalone via
`target_embedding` for the M-FALCON delta path).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.padded import valid_mask


class ActionEncoder(nn.Module):
    action_embedding_dim: int
    action_feature_name: str
    action_weights: Tuple[int, ...]
    watchtime_feature_name: str = ""
    watchtime_to_action_thresholds_and_weights: Tuple[Tuple[int, int], ...] = ()

    @property
    def num_action_types(self) -> int:
        return len(self.action_weights) + len(
            self.watchtime_to_action_thresholds_and_weights
        )

    @property
    def output_embedding_dim(self) -> int:
        return self.action_embedding_dim * self.num_action_types

    def setup(self) -> None:
        A, d = self.num_action_types, self.action_embedding_dim
        self._table = self.param(
            "action_embedding_table", nn.initializers.normal(0.1), (A, d)
        )
        self._target_table = self.param(
            "target_action_embedding_table",
            nn.initializers.normal(0.1),
            (1, A * d),
        )

    def target_embedding(self) -> jax.Array:
        """[1, A*d] — the learned candidate-position action embedding."""
        return self._target_table

    def encode_actions(self, actions: jax.Array, watchtimes=None) -> jax.Array:
        """Bitmask [..., ] -> [..., A*d] embeddings (uih positions)."""
        A, d = self.num_action_types, self.action_embedding_dim
        actions = actions.astype(jnp.int32)
        if self.watchtime_to_action_thresholds_and_weights:
            for threshold, weight in (
                self.watchtime_to_action_thresholds_and_weights
            ):
                actions = jnp.bitwise_or(
                    actions,
                    (watchtimes >= threshold).astype(jnp.int32) * weight,
                )
        combined_weights = jnp.asarray(
            list(self.action_weights)
            + [w for _, w in self.watchtime_to_action_thresholds_and_weights],
            jnp.int32,
        )
        exploded = (
            jnp.bitwise_and(actions[..., None], combined_weights) > 0
        )  # [..., A]
        return (
            exploded[..., None].astype(self._table.dtype) * self._table
        ).reshape(*actions.shape, A * d)

    def __call__(
        self,
        uih_lengths: jax.Array,  # int[B] — uih prefix length per row
        seq_lengths: jax.Array,  # int[B] — uih + candidates
        seq_payloads: Dict[str, jax.Array],  # merged [B, N] features
    ) -> jax.Array:
        """Returns [B, N, num_action_types * action_embedding_dim]."""
        actions = seq_payloads[self.action_feature_name]
        watchtimes = (
            seq_payloads.get(self.watchtime_feature_name)
            if self.watchtime_to_action_thresholds_and_weights
            else None
        )
        B, N = actions.shape
        uih_emb = self.encode_actions(actions, watchtimes)
        # candidate positions (>= uih_length) use the learned target embedding
        is_uih = valid_mask(uih_lengths, N)[:, :, None]
        return jnp.where(
            is_uih, uih_emb, self._target_table.reshape(1, 1, -1)
        )


class ContentEncoder(nn.Module):
    """TPU twin of `modules/content_encoder.py:28-110`: concatenates payload
    side-features onto item embeddings; `target_enrich_features` exist only
    for candidates — uih positions get a learned dummy embedding."""

    input_embedding_dim: int
    additional_content_features: Tuple[Tuple[str, int], ...] = ()
    target_enrich_features: Tuple[Tuple[str, int], ...] = ()

    @property
    def output_embedding_dim(self) -> int:
        return self.input_embedding_dim + sum(
            d for _, d in self.additional_content_features
        ) + sum(d for _, d in self.target_enrich_features)

    @nn.compact
    def __call__(
        self,
        seq_embeddings: jax.Array,  # [B, N, D]
        uih_lengths: jax.Array,  # int[B]
        seq_payloads: Dict[str, jax.Array],  # [B, N, d_f] merged features
    ) -> jax.Array:
        parts = [seq_embeddings]
        for name, _dim in self.additional_content_features:
            parts.append(seq_payloads[name].astype(seq_embeddings.dtype))
        N = seq_embeddings.shape[1]
        is_uih = valid_mask(uih_lengths, N)[:, :, None]
        for name, dim in self.target_enrich_features:
            dummy = self.param(
                f"target_enrich_dummy_{name}",
                nn.initializers.normal(0.1),
                (1, dim),
            )
            enrich = seq_payloads[name].astype(seq_embeddings.dtype)
            parts.append(
                jnp.where(is_uih, dummy.reshape(1, 1, dim), enrich)
            )
        if len(parts) == 1:
            return seq_embeddings
        return jnp.concatenate(parts, axis=-1)
