"""Top-level sequential recommender: embedding + input preproc + encoder +
output postproc + similarity.

TPU twin of `research/modeling/similarity_module.py:23-67`
(SequentialEncoderWithLearnedSimilarityModule) wiring HSTU or SASRec, as
assembled by `research/modeling/sequential/encoder_utils.py:37-150` and
`research/trainer/train.py:170-216`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.models.embeddings import LocalEmbeddingModule
from generative_recommenders_tpu.models.hstu import HSTUEncoder
from generative_recommenders_tpu.models.postprocessors import (
    make_output_postprocessor,
)
from generative_recommenders_tpu.models.preprocessors import (
    LearnablePositionalEmbeddingInputFeaturesPreprocessor,
)
from generative_recommenders_tpu.models.rails.mol import MoLConfig, MoLSimilarity
from generative_recommenders_tpu.models.sasrec import SASRecEncoder
from generative_recommenders_tpu.models.similarity import dot_product_similarity


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Dataclass replacement for the reference's gin-wired encoder params
    (`encoder_utils.py:37-150` + frozen `configs/*/*.gin`)."""

    main_module: str = "HSTU"  # "HSTU" | "SASRec"
    num_items: int = 1000
    max_sequence_len: int = 200
    gr_output_length: int = 10  # extra output slots; total N = max_seq + gr + 1
    item_embedding_dim: int = 50
    num_blocks: int = 8
    num_heads: int = 2
    dqk: int = 25
    dv: int = 25
    linear_dropout_rate: float = 0.2
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.2  # input preproc dropout
    user_embedding_norm: str = "l2_norm"
    enable_relative_attention_bias: bool = True
    linear_activation: str = "silu"
    concat_ua: bool = False
    # SASRec-only
    ffn_hidden_dim: int = 64
    ffn_activation_fn: str = "relu"
    attn_kernel: str = "xla"  # "xla" | "pallas"
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    remat: bool = False  # per-block activation recomputation
    # similarity (`research/modeling/similarity_utils.py:204-223`)
    interaction_module_type: str = "DotProduct"  # "DotProduct" | "MoL"
    mol_config: Optional[MoLConfig] = None

    @property
    def total_seq_len(self) -> int:
        return self.max_sequence_len + self.gr_output_length + 1


class SequentialRecommender(nn.Module):
    """Encoder + learned-similarity retrieval model.

    Methods mirror the reference interface:
      * get_item_embeddings(ids)         (`similarity_module.py:40`)
      * __call__(...) -> [B, N, D]       (HSTU.forward, `hstu.py:711`)
      * encode(...)   -> [B, D]          (HSTU.encode, `hstu.py:779`)
      * similarity_fn(query, items)      (`similarity_module.py:47`)
    """

    config: ModelConfig
    # optional sharded-lookup exchange (table, ids[B, M]) -> [B, M, D]; bound
    # by parallel/train.DistributedTrainer when the mesh row-shards the table
    lookup_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None

    def setup(self) -> None:
        cfg = self.config
        self.embedding_module = LocalEmbeddingModule(
            num_items=cfg.num_items,
            embedding_dim=cfg.item_embedding_dim,
            lookup_fn=self.lookup_fn,
        )
        self.input_preproc = LearnablePositionalEmbeddingInputFeaturesPreprocessor(
            max_sequence_len=cfg.total_seq_len,
            embedding_dim=cfg.item_embedding_dim,
            dropout_rate=cfg.dropout_rate,
            pos_emb_init=(
                "xavier_normal" if cfg.main_module == "HSTU" else "truncated_normal"
            ),
        )
        if cfg.main_module == "HSTU":
            self.encoder = HSTUEncoder(
                embedding_dim=cfg.item_embedding_dim,
                num_blocks=cfg.num_blocks,
                num_heads=cfg.num_heads,
                attention_dim=cfg.dqk,
                linear_dim=cfg.dv,
                linear_dropout_rate=cfg.linear_dropout_rate,
                attn_dropout_rate=cfg.attn_dropout_rate,
                linear_activation=cfg.linear_activation,
                enable_relative_attention_bias=cfg.enable_relative_attention_bias,
                concat_ua=cfg.concat_ua,
                attn_kernel=cfg.attn_kernel,
                max_total_seq_len=cfg.total_seq_len,
                remat=cfg.remat,
            )
        elif cfg.main_module == "SASRec":
            self.encoder = SASRecEncoder(
                embedding_dim=cfg.item_embedding_dim,
                num_blocks=cfg.num_blocks,
                num_heads=cfg.num_heads,
                ffn_hidden_dim=cfg.ffn_hidden_dim,
                ffn_activation_fn=cfg.ffn_activation_fn,
                ffn_dropout_rate=cfg.linear_dropout_rate,
            )
        else:
            raise ValueError(f"Unknown main_module {cfg.main_module}")
        self.output_postproc = make_output_postprocessor(
            cfg.user_embedding_norm, cfg.item_embedding_dim
        )
        if cfg.interaction_module_type == "MoL":
            self.mol = MoLSimilarity(
                cfg.mol_config
                or MoLConfig(
                    query_embedding_dim=cfg.item_embedding_dim,
                    item_embedding_dim=cfg.item_embedding_dim,
                )
            )
        elif cfg.interaction_module_type != "DotProduct":
            raise ValueError(
                f"Unknown interaction_module_type {cfg.interaction_module_type}"
            )

    def get_item_embeddings(self, item_ids: jax.Array) -> jax.Array:
        return self.embedding_module(item_ids)

    def initialize(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_payloads: Dict[str, jax.Array],
    ) -> jax.Array:
        """Touches every submodule so ``model.init(..., method='initialize')``
        creates the full parameter tree."""
        emb = self.get_item_embeddings(past_ids)
        out = self.generate_user_embeddings(
            past_lengths, past_ids, emb, past_payloads, deterministic=True
        )
        if self.config.interaction_module_type == "MoL":
            self.similarity_fn(
                out[:, -1, :],
                emb[:, :2, :],
                user_ids=jnp.zeros_like(past_lengths),
                deterministic=True,
            )
        return out

    def generate_user_embeddings(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_embeddings: jax.Array,
        past_payloads: Dict[str, jax.Array],
        deterministic: bool = False,
    ) -> jax.Array:
        cfg = self.config
        lengths, user_embeddings, valid_mask = self.input_preproc(
            past_lengths, past_ids, past_embeddings, past_payloads,
            deterministic=deterministic,
        )
        if cfg.compute_dtype == "bfloat16":
            user_embeddings = user_embeddings.astype(jnp.bfloat16)
        timestamps = past_payloads.get("timestamps") if (
            cfg.main_module == "HSTU" and cfg.enable_relative_attention_bias
        ) else None
        if cfg.main_module == "SASRec":
            encoded = self.encoder(
                user_embeddings, lengths, None,
                deterministic=deterministic, valid_mask=valid_mask,
            )
        else:
            encoded = self.encoder(
                user_embeddings, lengths, timestamps, deterministic=deterministic
            )
        return self.output_postproc(encoded.astype(jnp.float32))

    def __call__(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_embeddings: jax.Array,
        past_payloads: Dict[str, jax.Array],
        deterministic: bool = False,
    ) -> jax.Array:
        return self.generate_user_embeddings(
            past_lengths, past_ids, past_embeddings, past_payloads, deterministic
        )

    def encode(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_embeddings: jax.Array,
        past_payloads: Dict[str, jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        encoded = self.generate_user_embeddings(
            past_lengths, past_ids, past_embeddings, past_payloads, deterministic
        )  # [B, N, D]
        return get_current_embeddings(past_lengths, encoded)

    # ------------------------------------------------ KV-cached encode
    # Research twin of the reference's delta_x_offsets path
    # (`research/modeling/sequential/hstu.py:147-223,284-444`): encode the
    # prefix once, then score appended tokens at O(M*N) instead of O(N^2).

    def encode_with_cache(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_embeddings: jax.Array,
        past_payloads: Dict[str, jax.Array],
        reserved_slots: int = 0,
    ):
        """Full encode that also returns per-layer KV caches
        (HSTUCacheState analogue). HSTU-only.

        ``reserved_slots`` must be the number of delta tokens a later
        `encode_delta` will append (M): the caches are trimmed by M padded
        columns so the delta run reproduces EXACTLY this call's width — the
        silu normalizer is 1/width and the bias window is width-keyed, so a
        mismatched width silently diverges from a full re-encode. (The
        trimmed columns are dead padding as long as every row satisfies
        lengths <= width - M, which the gr_output_length tail slots
        guarantee in the research batch layout.)

        Contract: with relative time bias enabled, row i's bias reads
        ts[i+1], so ``past_payloads["timestamps"]`` must carry the next
        (first delta) timestamp at position ``past_lengths`` — the layout
        `seq_features_from_row` produces via its target-ts scatter
        (`features.py:42-44`); otherwise the cached prefix diverges from a
        full re-encode."""
        cfg = self.config
        assert cfg.main_module == "HSTU", "KV-cached encode is HSTU-only"
        lengths, user_embeddings, _ = self.input_preproc(
            past_lengths, past_ids, past_embeddings, past_payloads,
            deterministic=True,
        )
        if cfg.compute_dtype == "bfloat16":
            user_embeddings = user_embeddings.astype(jnp.bfloat16)
        timestamps = (
            past_payloads.get("timestamps")
            if cfg.enable_relative_attention_bias
            else None
        )
        encoded, caches = self.encoder(
            user_embeddings, lengths, timestamps,
            deterministic=True, return_caches=True,
        )
        if reserved_slots > 0:
            caches = [
                (k[:, :-reserved_slots], v[:, :-reserved_slots])
                for k, v in caches
            ]
        out = self.output_postproc(encoded.astype(jnp.float32))
        return get_current_embeddings(past_lengths, out), caches

    def encode_delta(
        self,
        cache_lengths: jax.Array,  # int[B] — prefix length per row
        delta_ids: jax.Array,  # int[B, M] — the M appended tokens
        delta_embeddings: jax.Array,  # [B, M, D]
        full_payloads: Dict[str, jax.Array],  # timestamps over prefix+delta
        caches,
    ):
        """Encode only the M appended tokens against the cached prefix.
        Returns (current embedding [B, D] after the append, new caches)."""
        cfg = self.config
        assert cfg.main_module == "HSTU", "KV-cached encode is HSTU-only"
        B, M = delta_ids.shape
        positions = (
            cache_lengths[:, None]
            + jnp.arange(M, dtype=jnp.int32)[None, :]
        )
        _, delta_emb, _ = self.input_preproc(
            cache_lengths, delta_ids, delta_embeddings, full_payloads,
            deterministic=True, delta_positions=positions,
        )
        if cfg.compute_dtype == "bfloat16":
            delta_emb = delta_emb.astype(jnp.bfloat16)
        timestamps = (
            full_payloads.get("timestamps")
            if cfg.enable_relative_attention_bias
            else None
        )
        encoded, new_caches = self.encoder(
            delta_emb, cache_lengths + M, timestamps,
            deterministic=True, caches=caches, cache_lengths=cache_lengths,
        )
        out = self.output_postproc(encoded.astype(jnp.float32))
        return out[:, -1, :], new_caches

    def similarity_fn(
        self,
        query_embeddings: jax.Array,  # [B, D]
        item_embeddings: jax.Array,  # [1/B, X, D]
        user_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """`similarity_module.py:47` — DotProduct or MoL (RAILS)."""
        if self.config.interaction_module_type == "MoL":
            return self.mol(
                query_embeddings, item_embeddings, user_ids, deterministic
            )
        return dot_product_similarity(query_embeddings, item_embeddings)

    def mol_item_components(self, item_embeddings: jax.Array):
        """Decoupled-inference precompute for MoL top-k
        (`similarity_fn.py:292-312`): returns (i_comp [X, P_X, d], gi [X, E])."""
        i_comp = self.mol.item_components(item_embeddings[None])[0]
        gi = self.mol.gating_item_partial(item_embeddings[None])
        return i_comp, (gi[0] if gi is not None else None)

    def mol_score_components(
        self,
        query_embeddings: jax.Array,  # [B, D]
        i_comp: jax.Array,  # [X, P_X, d]
        gi: Optional[jax.Array],  # [X, E]
        user_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        q_comp, _ = self.mol.query_components(query_embeddings, user_ids, True)
        logits, _ = self.mol.score_components(
            query_embeddings,
            q_comp,
            i_comp[None],
            gi[None] if gi is not None else None,
            True,
        )
        return logits


# canonical implementation lives in models/seq_utils.py
from generative_recommenders_tpu.models.seq_utils import (  # noqa: E402
    get_current_embeddings,
)
