"""Input-features preprocessors (research stack).

TPU twin of `research/modeling/sequential/input_features_preprocessors.py`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LearnablePositionalEmbeddingInputFeaturesPreprocessor(nn.Module):
    """emb * sqrt(D) + learned position embedding, dropout, zero-mask pads
    (`input_features_preprocessors.py:42-89`).

    Note on init: the reference constructs the table with trunc-normal, but
    `HSTU.reset_params` (`hstu.py:642-656`) immediately re-initializes every
    param outside `_hstu`/`_embedding_module` with xavier-normal — so the
    effective init for the HSTU path is xavier-normal, which we use here.
    SASRec's `reset_state` skips the preprocessor, keeping trunc-normal
    std=sqrt(1/D); select via ``pos_emb_init``.
    """

    max_sequence_len: int
    embedding_dim: int
    dropout_rate: float
    pos_emb_init: str = "xavier_normal"  # "xavier_normal" | "truncated_normal"

    @nn.compact
    def __call__(
        self,
        past_lengths: jax.Array,  # int[B]
        past_ids: jax.Array,  # int[B, N]
        past_embeddings: jax.Array,  # [B, N, D]
        past_payloads: Dict[str, jax.Array],
        deterministic: bool = False,
        delta_positions: Optional[jax.Array] = None,  # int[B, M] absolute pos
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        B, N = past_ids.shape
        if self.pos_emb_init == "xavier_normal":
            init = nn.initializers.xavier_normal()
        else:
            init = nn.initializers.truncated_normal(
                stddev=(1.0 / self.embedding_dim) ** 0.5, lower=-2.0, upper=2.0
            )
        pos_emb = self.param(
            "pos_emb", init, (self.max_sequence_len, self.embedding_dim), jnp.float32
        )
        scale = self.embedding_dim**0.5
        if delta_positions is not None:
            # KV-cached delta encode: the M new tokens sit at per-row
            # absolute positions, so gather their position embeddings
            pos = jnp.take(
                pos_emb,
                jnp.clip(delta_positions, 0, self.max_sequence_len - 1),
                axis=0,
            )
            user_embeddings = past_embeddings * scale + pos
        else:
            user_embeddings = past_embeddings * scale + pos_emb[None, :N, :]
        user_embeddings = nn.Dropout(self.dropout_rate)(
            user_embeddings, deterministic=deterministic
        )
        valid_mask = (past_ids != 0)[..., None].astype(user_embeddings.dtype)
        return past_lengths, user_embeddings * valid_mask, valid_mask


class LearnablePositionalEmbeddingRatedInputFeaturesPreprocessor(nn.Module):
    """Item ++ rating embedding concat variant
    (`input_features_preprocessors.py:92-152`)."""

    max_sequence_len: int
    item_embedding_dim: int
    rating_embedding_dim: int
    num_ratings: int
    dropout_rate: float

    @property
    def output_dim(self) -> int:
        return self.item_embedding_dim + self.rating_embedding_dim

    @nn.compact
    def __call__(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_embeddings: jax.Array,
        past_payloads: Dict[str, jax.Array],
        deterministic: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        B, N = past_ids.shape
        D = self.output_dim
        tn = nn.initializers.truncated_normal(
            stddev=(1.0 / D) ** 0.5, lower=-2.0, upper=2.0
        )
        pos_emb = self.param("pos_emb", tn, (self.max_sequence_len, D), jnp.float32)
        rating_emb = self.param(
            "rating_emb", tn, (self.num_ratings, self.rating_embedding_dim), jnp.float32
        )
        ratings = jnp.clip(
            past_payloads["ratings"].astype(jnp.int32), 0, self.num_ratings - 1
        )
        user_embeddings = (
            jnp.concatenate(
                [past_embeddings, jnp.take(rating_emb, ratings, axis=0)], axis=-1
            )
            * (D**0.5)
            + pos_emb[None, :N, :]
        )
        user_embeddings = nn.Dropout(self.dropout_rate)(
            user_embeddings, deterministic=deterministic
        )
        valid_mask = (past_ids != 0)[..., None].astype(user_embeddings.dtype)
        return past_lengths, user_embeddings * valid_mask, valid_mask


class CombinedItemAndRatingInputFeaturesPreprocessor(nn.Module):
    """Interleaves item and rating embeddings — [i0, r0, i1, r1, ...] —
    doubling the sequence (`input_features_preprocessors.py:155-254`).
    Output length is 2N; lengths double; valid mask repeats per pair.
    """

    max_sequence_len: int  # N (pre-interleave)
    embedding_dim: int
    dropout_rate: float
    num_ratings: int

    @nn.compact
    def __call__(
        self,
        past_lengths: jax.Array,  # int[B]
        past_ids: jax.Array,  # int[B, N]
        past_embeddings: jax.Array,  # [B, N, D]
        past_payloads: Dict[str, jax.Array],
        deterministic: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        B, N = past_ids.shape
        D = self.embedding_dim
        init = nn.initializers.truncated_normal(
            stddev=(1.0 / D) ** 0.5, lower=-2.0, upper=2.0
        )
        pos_emb = self.param(
            "pos_emb", init, (self.max_sequence_len * 2, D), jnp.float32
        )
        rating_emb_table = self.param(
            "rating_emb", init, (self.num_ratings, D), jnp.float32
        )
        ratings = jnp.clip(
            past_payloads["ratings"].astype(jnp.int32), 0, self.num_ratings - 1
        )
        rating_embeddings = jnp.take(rating_emb_table, ratings, axis=0)
        # interleave along the sequence axis -> [B, 2N, D]
        user_embeddings = jnp.stack(
            [past_embeddings, rating_embeddings], axis=2
        ).reshape(B, 2 * N, D)
        scale = D**0.5
        user_embeddings = user_embeddings * scale + pos_emb[None, : 2 * N, :]
        user_embeddings = nn.Dropout(self.dropout_rate)(
            user_embeddings, deterministic=deterministic
        )
        valid = (past_ids != 0)[:, :, None]  # [B, N, 1]
        valid_mask = (
            jnp.repeat(valid, 2, axis=1).reshape(B, 2 * N, 1)
        ).astype(user_embeddings.dtype)
        return (
            past_lengths * 2,
            user_embeddings * valid_mask,
            valid_mask,
        )
