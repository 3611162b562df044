"""DlrmHSTU — the end-to-end production multitask ranker.

TPU twin of `modules/dlrm_hstu.py:64-547`: embedding lookup of uih +
candidate features → merge into one [uih | candidates] sequence → item tower
MLP ‖ user tower (HSTUTransducer) → multitask supervision decoded from
candidate action bitmasks + watchtime.

Replaces torchrec `EmbeddingCollection` with plain flax tables stored under
the param collection path "embedding_tables/<table>" — the distributed
sharding rules (`parallel/sharding.py`) row-shard any 2-D param on that path
across the "model" mesh axis, giving the DistributedModelParallel behavior
declaratively.

Batch layout (KeyedJaggedTensor analogue, padded-dense):
  uih_features:        Dict[name, [B, max_uih_len]]     + uih_lengths int[B]
  candidates_features: Dict[name, [B, max_num_candidates]] + num_candidates
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.modules.hstu_transducer import HSTUTransducer
from generative_recommenders_tpu.modules.mlp import SwishMLP
from generative_recommenders_tpu.modules.multitask_module import (
    DefaultMultitaskModule,
    MultitaskTaskType,
    TaskConfig,
    get_supervision_labels_and_weights,
)
from generative_recommenders_tpu.modules.positional_encoder import (
    HSTUPositionalEncoder,
)
from generative_recommenders_tpu.modules.postprocessors import (
    L2NormPostprocessor,
    LayerNormPostprocessor,
    TimestampLayerNormPostprocessor,
)
from generative_recommenders_tpu.modules.preprocessors import (
    ContextualPreprocessor,
)
from generative_recommenders_tpu.modules.stu import STULayerConfig, STUStack
from generative_recommenders_tpu.ops.padded import concat_tail, valid_mask


@dataclasses.dataclass(frozen=True)
class EmbeddingTableConfig:
    """torchrec EmbeddingConfig analogue (`dlrm_v3/configs.py:293-439`)."""

    name: str
    num_embeddings: int
    embedding_dim: int
    feature_names: Tuple[str, ...]


@dataclasses.dataclass(frozen=True)
class DlrmHSTUConfig:
    """Mirrors `modules/dlrm_hstu.py:64-97`."""

    max_uih_len: int = 256
    max_num_candidates: int = 10
    max_num_candidates_inference: int = 5
    hstu_num_heads: int = 1
    hstu_attn_linear_dim: int = 256
    hstu_attn_qk_dim: int = 128
    hstu_attn_num_layers: int = 12
    hstu_embedding_table_dim: int = 192
    hstu_transducer_embedding_dim: int = 0
    hstu_group_norm: bool = False
    hstu_input_dropout_ratio: float = 0.2
    hstu_linear_dropout_rate: float = 0.2
    contextual_feature_to_max_length: Tuple[Tuple[str, int], ...] = ()
    contextual_feature_to_min_uih_length: Tuple[Tuple[str, int], ...] = ()
    candidates_weight_feature_name: str = ""
    candidates_watchtime_feature_name: str = ""
    candidates_querytime_feature_name: str = ""
    causal_multitask_weights: float = 0.2
    multitask_configs: Tuple[TaskConfig, ...] = ()
    user_embedding_feature_names: Tuple[str, ...] = ()
    item_embedding_feature_names: Tuple[str, ...] = ()
    uih_post_id_feature_name: str = ""
    uih_action_time_feature_name: str = ""
    uih_weight_feature_name: str = ""
    merge_uih_candidate_feature_mapping: Tuple[Tuple[str, str], ...] = ()
    action_weights: Optional[Tuple[int, ...]] = None
    enable_postprocessor: bool = True
    use_layer_norm_postprocessor: bool = False
    attn_kernel: str = "xla"  # "xla" | "pallas"
    num_position_buckets: int = 8192
    num_time_buckets: int = 2048
    # dynamic STU wrappers (`modules/dynamic_stu.py`); incompatible with the
    # M-FALCON cached path
    hstu_stochastic_depth_ratio: float = 0.0
    hstu_l2_max_len: int = 0


class DlrmHSTU(nn.Module):
    cfg: DlrmHSTUConfig
    embedding_tables: Tuple[EmbeddingTableConfig, ...]
    # Distributed table-lookup engine: a callable (table f32[R, D],
    # ids i32[B, N]) → f32[B, N, D]. ``None`` = plain jnp.take (single
    # device / GSPMD default). The trainers bind the all-to-all exchange
    # (`parallel/embedding.py:sharded_lookup`) here when the mesh has a
    # model axis — the torchrec-DMP routing (`dlrm_v3/train/utils.py:230`).
    lookup_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None

    def setup(self) -> None:
        cfg = self.cfg
        feature_to_table: Dict[str, str] = {}
        tables = {}
        for t in self.embedding_tables:
            tables[t.name] = self.param(
                f"embedding_tables_{t.name}",
                nn.initializers.truncated_normal(0.02),
                (t.num_embeddings, t.embedding_dim),
            )
            for f in t.feature_names:
                feature_to_table[f] = t.name
        self._feature_to_table = feature_to_table
        self._tables = tables

        ctx_len = sum(l for _, l in cfg.contextual_feature_to_max_length)
        stu_cfg = STULayerConfig(
            embedding_dim=cfg.hstu_transducer_embedding_dim,
            num_heads=cfg.hstu_num_heads,
            hidden_dim=cfg.hstu_attn_linear_dim,
            attention_dim=cfg.hstu_attn_qk_dim,
            output_dropout_ratio=cfg.hstu_linear_dropout_rate,
            use_group_norm=cfg.hstu_group_norm,
            contextual_seq_len=ctx_len,
            attn_kernel=cfg.attn_kernel,
            # fixed silu normalizer = training-time padded length, so the
            # M-FALCON prefill/delta passes normalize identically
            norm_seq_len=ctx_len + cfg.max_uih_len + cfg.max_num_candidates,
        )
        stack = STUStack(
            tuple(stu_cfg for _ in range(cfg.hstu_attn_num_layers)),
            stochastic_depth_ratio=cfg.hstu_stochastic_depth_ratio,
            l2_max_len=cfg.hstu_l2_max_len,
            name="stu",
        )
        preproc = ContextualPreprocessor(
            input_embedding_dim=cfg.hstu_embedding_table_dim,
            output_embedding_dim=cfg.hstu_transducer_embedding_dim,
            contextual_feature_to_max_length=cfg.contextual_feature_to_max_length,
            contextual_feature_to_min_uih_length=(
                cfg.contextual_feature_to_min_uih_length
            ),
            action_feature_name=cfg.uih_weight_feature_name,
            action_weights=cfg.action_weights,
            name="preprocessor",
        )
        pos_enc = HSTUPositionalEncoder(
            num_position_buckets=cfg.num_position_buckets,
            num_time_buckets=cfg.num_time_buckets,
            embedding_dim=cfg.hstu_transducer_embedding_dim,
            contextual_seq_len=ctx_len,
            name="positional_encoder",
        )
        if not cfg.enable_postprocessor:
            postproc = None
        elif cfg.use_layer_norm_postprocessor:
            postproc = LayerNormPostprocessor(
                embedding_dim=cfg.hstu_transducer_embedding_dim,
                name="postprocessor",
            )
        else:
            postproc = TimestampLayerNormPostprocessor(
                embedding_dim=cfg.hstu_transducer_embedding_dim,
                time_duration_features=((3600, 24), (86400, 7)),
                name="postprocessor",
            )  # hour-of-day / day-of-week (`dlrm_hstu.py:205-212`)
        self._transducer = HSTUTransducer(
            stu_module=stack,
            input_preprocessor=preproc,
            output_postprocessor=postproc,
            positional_encoder=pos_enc,
            input_dropout_ratio=cfg.hstu_input_dropout_ratio,
            name="hstu_transducer",
        )
        self._item_mlp = SwishMLP(
            512,
            cfg.hstu_transducer_embedding_dim,
            name="item_embedding_mlp",
        )
        self._multitask = DefaultMultitaskModule(
            task_configs=cfg.multitask_configs,
            embedding_dim=cfg.hstu_transducer_embedding_dim,
            causal_multitask_weights=cfg.causal_multitask_weights,
            name="multitask_module",
        )

    # ------------------------------------------------------------- embedding
    def _lookup(self, feature: str, ids: jax.Array) -> jax.Array:
        table = self._tables[self._feature_to_table[feature]]
        if self.lookup_fn is not None:
            return self.lookup_fn(table, ids.astype(jnp.int32))
        return jnp.take(table, ids.astype(jnp.int32), axis=0)

    def preprocess(
        self,
        uih_features: Dict[str, jax.Array],
        uih_lengths: jax.Array,
        candidates_features: Dict[str, jax.Array],
        num_candidates: jax.Array,
    ):
        """EmbeddingCollection lookup + uih/candidate merge
        (`dlrm_hstu.py:339-425` + `main_forward` merge at :443-465)."""
        return lookup_and_merge_features(
            self.cfg,
            self._feature_to_table,
            self._lookup,
            uih_features,
            uih_lengths,
            candidates_features,
        )

    # ---------------------------------------------------------------- towers
    def _item_forward(
        self, seq_embeddings: Dict[str, jax.Array]
    ) -> jax.Array:
        """Item tower on candidate-side embeddings [B, M, D]
        (`dlrm_hstu.py:323-337` — reads the candidate features directly,
        not the merged sequence)."""
        cfg = self.cfg
        cand_embs = [
            seq_embeddings[name] for name in cfg.item_embedding_feature_names
        ]
        return self._item_mlp(jnp.concatenate(cand_embs, axis=-1))

    def main_forward(
        self,
        seq_embeddings: Dict[str, jax.Array],
        payload_features: Dict[str, jax.Array],
        uih_lengths: jax.Array,
        num_candidates: jax.Array,
        deterministic: bool = True,
        compute_losses: bool = True,
    ):
        """`dlrm_hstu.py:427-512`."""
        cfg = self.cfg
        M = cfg.max_num_candidates
        seq_lengths = uih_lengths + num_candidates
        item_embeddings = self._item_forward(seq_embeddings)
        # merged timestamps: uih action time | candidate query time
        merged_ts = payload_features[cfg.uih_action_time_feature_name]
        user_embeddings, _ = self._transducer(
            seq_embeddings[cfg.uih_post_id_feature_name],
            seq_lengths,
            merged_ts,
            uih_lengths,
            num_candidates,
            {**payload_features, **seq_embeddings},
            max_targets=M,
            deterministic=deterministic,
        )
        labels, weights = get_supervision_labels_and_weights(
            payload_features[cfg.candidates_weight_feature_name],
            payload_features[cfg.candidates_watchtime_feature_name],
            cfg.multitask_configs,
        )
        cand_valid = valid_mask(num_candidates, M)
        preds, mt_labels, mt_weights, mt_losses = self._multitask(
            user_embeddings,
            item_embeddings,
            labels,
            weights,
            cand_valid,
            compute_losses=compute_losses,
        )
        aux_losses = {}
        if compute_losses:
            for i, t in enumerate(cfg.multitask_configs):
                aux_losses[t.task_name] = mt_losses[i]
        return (
            user_embeddings,
            item_embeddings,
            aux_losses,
            preds,
            mt_labels,
            mt_weights,
        )

    def __call__(
        self,
        uih_features: Dict[str, jax.Array],
        uih_lengths: jax.Array,
        candidates_features: Dict[str, jax.Array],
        num_candidates: jax.Array,
        deterministic: bool = True,
        compute_losses: bool = True,
    ):
        """`dlrm_hstu.py:514-547`."""
        seq_embeddings, payload_features = self.preprocess(
            uih_features, uih_lengths, candidates_features, num_candidates
        )
        return self.main_forward(
            seq_embeddings,
            payload_features,
            uih_lengths,
            num_candidates,
            deterministic=deterministic,
            compute_losses=compute_losses,
        )

    # ---------------------------------------------------- M-FALCON serving
    def mfalcon_prefill(
        self,
        uih_features: Dict[str, jax.Array],
        uih_lengths: jax.Array,
        query_time: jax.Array,  # int[B] — candidates' query time
    ):
        """Encode the uih once; returns (per-layer KV caches, ctx lengths).
        Serving twin of the sequence-encode stage of
        `dlrm_v3/inference/model_family.py` with the `stu.py:354-418`
        cache."""
        cfg = self.cfg
        seq_embeddings: Dict[str, jax.Array] = {}
        payload_features: Dict[str, jax.Array] = {}
        for f, v in uih_features.items():
            if f in self._feature_to_table:
                seq_embeddings[f] = self._lookup(f, v)
            else:
                payload_features[f] = v
        return self._transducer.prefill(
            seq_embeddings[cfg.uih_post_id_feature_name],
            uih_lengths,
            payload_features[cfg.uih_action_time_feature_name],
            query_time,
            {**payload_features, **seq_embeddings},
        )

    def mfalcon_score_chunk(
        self,
        caches,
        candidates_features: Dict[str, jax.Array],  # [B, m] chunk
        query_time: jax.Array,  # int[B]
    ) -> jax.Array:
        """Scores one m-candidate chunk against the caches; returns
        multitask preds [T, B, m] (M-FALCON microbatched scoring,
        `max_num_candidates_inference` candidates per pass)."""
        cfg = self.cfg
        cand_emb: Dict[str, jax.Array] = {}
        payloads: Dict[str, jax.Array] = {}
        for f, v in candidates_features.items():
            if f in self._feature_to_table:
                cand_emb[f] = self._lookup(f, v)
            else:
                payloads[f] = v
        item_embeddings = self._item_mlp(
            jnp.concatenate(
                [cand_emb[n] for n in cfg.item_embedding_feature_names],
                axis=-1,
            )
        )
        # the candidate twin of uih_post_id via the merge mapping
        mapping = dict(cfg.merge_uih_candidate_feature_mapping)
        cand_input = cand_emb[mapping[cfg.uih_post_id_feature_name]]
        cand_ts = payloads[cfg.candidates_querytime_feature_name]
        user_embeddings = self._transducer.cached_score(
            cand_input, cand_ts, caches, query_time
        )
        preds, _, _, _ = self._multitask(
            user_embeddings,
            item_embeddings,
            {},
            {},
            jnp.ones(cand_ts.shape, jnp.bool_),
            compute_losses=False,
        )
        return preds


def lookup_and_merge_features(
    cfg: DlrmHSTUConfig,
    feature_to_table: Dict[str, str],
    lookup_fn,
    uih_features: Dict[str, jax.Array],
    uih_lengths: jax.Array,
    candidates_features: Dict[str, jax.Array],
):
    """Pure lookup + uih/candidate merge, shared by DlrmHSTU.preprocess and
    the serving sparse stage (`dlrm_v3/inference/model_family.py:111-178`
    runs this on the quantized tables)."""
    seq_embeddings: Dict[str, jax.Array] = {}
    payload_features: Dict[str, jax.Array] = {}
    for f, ids in uih_features.items():
        if f in feature_to_table:
            seq_embeddings[f] = lookup_fn(f, ids)
        else:
            payload_features[f] = ids
    for f, vals in candidates_features.items():
        if f in feature_to_table:
            seq_embeddings[f] = lookup_fn(f, vals)
        else:
            payload_features[f] = vals
    # merge uih + candidate sequences (embeddings and payloads)
    for uih_name, cand_name in cfg.merge_uih_candidate_feature_mapping:
        if uih_name in seq_embeddings:
            seq_embeddings[uih_name] = concat_tail(
                seq_embeddings[uih_name], uih_lengths,
                seq_embeddings[cand_name],
            )
        elif uih_name in payload_features:
            payload_features[uih_name] = concat_tail(
                payload_features[uih_name], uih_lengths,
                payload_features[cand_name],
            )
    return seq_embeddings, payload_features
