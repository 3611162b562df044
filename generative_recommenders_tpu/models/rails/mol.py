"""MoL (Mixture-of-Logits) learned similarity — RAILS.

TPU twin of `research/rails/similarities/mol/similarity_fn.py` (MoLGatingFn
:102, MoLSimilarity :207, SoftmaxDropoutCombiner :69, load-balancing MI loss
:52), the query/item component-embedding fns
(`mol/query_embeddings_fn.py:38-163`, `mol/item_embeddings_fn.py:37-98`),
and the gin factory defaults (`research/modeling/similarity_utils.py:45-223`).

Similarity(q, x) = sum_{p,m} pi_{pm}(q, x) * <q_p, x_m> over P_Q query-side
and P_X item-side component embeddings; the gate pi is a softmax over the
P_Q*P_X logits produced from query/item/qi partial MLPs (glu_silu combo).

Decoupled inference (`get_item_component_embeddings`,
`similarity_fn.py:292-312`): `item_components` / `gating_item_partial` can be
precomputed once per corpus and reused across query batches (MoL top-k).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.models.rails.layers import SwiGLU
from generative_recommenders_tpu.ops.normalization import layer_norm


@dataclasses.dataclass(frozen=True)
class MoLConfig:
    """Defaults mirror `create_mol_interaction_module`
    (`similarity_utils.py:45-74`) and the frozen MoL gin configs."""

    query_embedding_dim: int
    item_embedding_dim: int
    dot_product_dimension: int = 32
    query_dot_product_groups: int = 4
    item_dot_product_groups: int = 4
    temperature: float = 0.05
    dot_product_l2_norm: bool = True
    query_dropout_rate: float = 0.0
    query_hidden_dim: int = 128
    item_dropout_rate: float = 0.0
    item_hidden_dim: int = 128
    gating_query_hidden_dim: int = 128
    gating_item_hidden_dim: int = 128
    gating_qi_hidden_dim: int = 128
    softmax_dropout_rate: float = 0.0
    gating_query_fn: bool = True
    gating_item_fn: bool = True
    gating_combination_type: str = "glu_silu"  # | "glu_silu_ln" | "none"
    uid_embedding_hash_sizes: Tuple[int, ...] = ()
    uid_dropout_rate: float = 0.5
    uid_embedding_level_dropout: bool = False
    eps: float = 1e-6

    @property
    def num_logits(self) -> int:
        return self.query_dot_product_groups * self.item_dot_product_groups


def load_balancing_mi_loss(gating_prs: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RAILS mutual-information load-balancing loss (`similarity_fn.py:52-66`)."""
    E = gating_prs.shape[-1]
    flat = gating_prs.reshape(-1, E)
    n = flat.shape[0]
    util = flat.sum(0) / n
    util_entropy = -(util * jnp.log(util + eps)).sum()
    per_example_entropy = -(flat * jnp.log(flat + eps)).sum() / n
    return -util_entropy + per_example_entropy


def softmax_dropout_combiner(
    gating_weights: jax.Array,  # [..., E]
    logits: jax.Array,  # [..., E]
    dropout_rate: float,
    dropout_rng: Optional[jax.Array],
    training: bool,
    eps: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """(softmax(gating) [· dropout renorm]) ⊙ logits, summed over E
    (`similarity_fn.py:34-50`). Returns (gating_prs, combined [...])."""
    prs = jax.nn.softmax(gating_weights, axis=-1)
    if training and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, prs.shape)
        prs = jnp.where(keep, prs / (1.0 - dropout_rate), 0.0)
        prs = prs / jnp.maximum(prs.sum(-1, keepdims=True), eps)
    return prs, (prs * logits).sum(-1)


class _ProjMLP(nn.Module):
    """Dropout -> SwiGLU(hidden) -> Linear(out) (`similarity_utils.py:92-103`)."""

    hidden_dim: int
    output_dim: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = SwiGLU(self.hidden_dim, name="glu")(x)
        return nn.Dense(
            self.output_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="out",
        )(x)


class _GatingMLP(nn.Module):
    """Linear -> SiLU -> Linear (`similarity_utils.py:124-176`)."""

    hidden_dim: int
    output_dim: int
    dropout_rate: float = 0.0
    out_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        if self.hidden_dim > 0:
            x = nn.Dense(
                self.hidden_dim,
                kernel_init=nn.initializers.xavier_uniform(),
                name="fc1",
            )(x)
            x = jax.nn.silu(x)
        return nn.Dense(
            self.output_dim,
            use_bias=self.out_bias,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc2",
        )(x)


class MoLSimilarity(nn.Module):
    """Callable similarity: (query [B, Dq], items [1/B, X, Di]) -> ([B, X], aux)."""

    config: MoLConfig

    def setup(self) -> None:
        cfg = self.config
        n_emb_groups = cfg.query_dot_product_groups - len(
            cfg.uid_embedding_hash_sizes
        )
        self._n_emb_groups = n_emb_groups
        self._query_proj = _ProjMLP(
            cfg.query_hidden_dim,
            cfg.dot_product_dimension * n_emb_groups,
            cfg.query_dropout_rate,
            name="query_proj",
        )
        self._item_proj = _ProjMLP(
            cfg.item_hidden_dim,
            cfg.dot_product_dimension * cfg.item_dot_product_groups,
            cfg.item_dropout_rate,
            name="item_proj",
        )
        self._uid_tables = [
            self.param(
                f"uid_embeddings_{i}",
                nn.initializers.normal(1.0),
                (hash_size + 1, cfg.dot_product_dimension),
            )
            for i, hash_size in enumerate(cfg.uid_embedding_hash_sizes)
        ]
        E = cfg.num_logits
        self._gating_query = (
            _GatingMLP(
                cfg.gating_query_hidden_dim, E, out_bias=False,
                name="gating_query",
            )
            if cfg.gating_query_fn
            else None
        )
        self._gating_item = (
            _GatingMLP(
                cfg.gating_item_hidden_dim, E, out_bias=False,
                name="gating_item",
            )
            if cfg.gating_item_fn
            else None
        )
        self._gating_qi = _GatingMLP(
            cfg.gating_qi_hidden_dim, E, name="gating_qi"
        )

    def _l2(self, x: jax.Array) -> jax.Array:
        # x / max(||x||, eps) with a zero-safe gradient: clamping the squared
        # sum (not the norm) avoids sqrt'(0)=inf NaNs for all-padding items
        sq = jnp.sum(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(jnp.maximum(sq, self.config.eps**2))

    # ------------------------------------------------------------ components
    def query_components(
        self,
        query_embeddings: jax.Array,  # [B, Dq]
        user_ids: Optional[jax.Array],
        deterministic: bool,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """(B, P_Q, d) split query embeddings (`query_embeddings_fn.py:84-163`)."""
        cfg = self.config
        B = query_embeddings.shape[0]
        aux: Dict[str, jax.Array] = {}
        q_comp = self._query_proj(query_embeddings, deterministic).reshape(
            B, self._n_emb_groups, cfg.dot_product_dimension
        )
        if cfg.uid_embedding_hash_sizes:
            assert user_ids is not None, "MoL with uid embeddings needs user_ids"
            parts = []
            for i, hash_size in enumerate(cfg.uid_embedding_hash_sizes):
                uid_emb = jnp.take(
                    self._uid_tables[i],
                    (user_ids.astype(jnp.int32) % hash_size) + 1,
                    axis=0,
                )
                if not deterministic:
                    l2 = jnp.mean(jnp.sum(uid_emb * uid_emb, axis=-1))
                    aux["uid_embedding_l2_norm"] = (
                        aux.get("uid_embedding_l2_norm", 0.0) + l2
                    )
                    if cfg.uid_dropout_rate > 0.0:
                        rng = self.make_rng("dropout")
                        shape = (
                            (B, 1)
                            if cfg.uid_embedding_level_dropout
                            else uid_emb.shape
                        )
                        keep = jax.random.bernoulli(
                            rng, 1.0 - cfg.uid_dropout_rate, shape
                        )
                        uid_emb = jnp.where(
                            keep, uid_emb / (1.0 - cfg.uid_dropout_rate), 0.0
                        )
                parts.append(uid_emb[:, None, :])
            q_comp = jnp.concatenate([q_comp] + parts, axis=1)
        if cfg.dot_product_l2_norm:
            q_comp = self._l2(q_comp)
        return q_comp, aux

    def item_components(
        self, item_embeddings: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """(..., P_X, d) split item embeddings (`item_embeddings_fn.py:65-98`)."""
        cfg = self.config
        i_comp = self._item_proj(item_embeddings, deterministic).reshape(
            *item_embeddings.shape[:-1],
            cfg.item_dot_product_groups,
            cfg.dot_product_dimension,
        )
        if cfg.dot_product_l2_norm:
            i_comp = self._l2(i_comp)
        return i_comp

    def gating_item_partial(
        self, item_embeddings: jax.Array, deterministic: bool = True
    ) -> Optional[jax.Array]:
        if self._gating_item is None:
            return None
        return self._gating_item(item_embeddings, deterministic)

    # --------------------------------------------------------------- scoring
    def score_components(
        self,
        query_embeddings: jax.Array,  # [B, Dq] (raw, for the query gate)
        q_comp: jax.Array,  # [B, P_Q, d]
        i_comp: jax.Array,  # [1/B, X, P_X, d]
        gi: Optional[jax.Array],  # [1/B, X, E] precomputed item gate
        deterministic: bool,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        cfg = self.config
        B = q_comp.shape[0]
        Bp, X = i_comp.shape[0], i_comp.shape[1]
        E = cfg.num_logits
        if Bp == 1:
            logits = jnp.einsum(
                "bnd,xmd->bxnm", q_comp, i_comp[0],
                preferred_element_type=jnp.float32,
            ).reshape(B, X, E)
        else:
            logits = jnp.einsum(
                "bnd,bxmd->bxnm", q_comp, i_comp,
                preferred_element_type=jnp.float32,
            ).reshape(B, X, E)
        logits = logits / cfg.temperature

        gq = (
            self._gating_query(query_embeddings, deterministic)[:, None, :]
            if self._gating_query is not None
            else None
        )
        gqi = self._gating_qi(logits, deterministic)
        if cfg.gating_combination_type == "glu_silu":
            gate_in = gq * gi + gqi
            gating_weights = gate_in * jax.nn.sigmoid(gate_in)
        elif cfg.gating_combination_type == "glu_silu_ln":
            gate_in = gq * gi + gqi
            gating_weights = gate_in * jax.nn.sigmoid(layer_norm(gate_in))
        elif cfg.gating_combination_type == "none":
            gating_weights = gqi
            if gq is not None:
                gating_weights = gating_weights + gq
            if gi is not None:
                gating_weights = gating_weights + gi
        else:
            raise ValueError(
                f"Unknown combination_type {cfg.gating_combination_type}"
            )
        rng = (
            self.make_rng("dropout")
            if (not deterministic and cfg.softmax_dropout_rate > 0.0)
            else None
        )
        prs, combined = softmax_dropout_combiner(
            gating_weights, logits, cfg.softmax_dropout_rate, rng,
            training=not deterministic, eps=cfg.eps,
        )
        aux: Dict[str, jax.Array] = {}
        if not deterministic:
            aux["mi_loss"] = load_balancing_mi_loss(prs, cfg.eps)
        return combined, aux

    def __call__(
        self,
        query_embeddings: jax.Array,  # [B, Dq]
        item_embeddings: jax.Array,  # [1, X, Di] or [B, X, Di]
        user_ids: Optional[jax.Array] = None,  # int[B]
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        q_comp, aux = self.query_components(
            query_embeddings, user_ids, deterministic
        )
        i_comp = self.item_components(item_embeddings, deterministic)
        gi = self.gating_item_partial(item_embeddings, deterministic)
        logits, score_aux = self.score_components(
            query_embeddings, q_comp, i_comp, gi, deterministic
        )
        return logits, {**aux, **score_aux}
