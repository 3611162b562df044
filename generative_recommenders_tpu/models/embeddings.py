"""Item embedding modules (research stack).

TPU twin of `research/modeling/sequential/embedding_modules.py:25-108`.
``padding_idx=0`` semantics are realized by masking the lookup with
``(ids != 0)`` — id 0 always embeds to 0 and receives no gradient.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def truncated_normal_init(stddev: float):
    """torch ``truncated_normal(std)`` twin: N(0, std) truncated at ±2σ."""
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


def _lookup(
    table: jax.Array,
    ids: jax.Array,
    num_items: int,
    lookup_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]],
) -> jax.Array:
    """Clipped table lookup, routed through ``lookup_fn`` when bound.

    ``lookup_fn`` is the sharded all-to-all exchange
    (`parallel/embedding.py:sharded_lookup`, the torchrec-DMP analogue) — it
    expects batch-sharded ids with a leading batch dim, so it only applies to
    ids of rank >= 2 (sequence / sampled-negative lookups); rank-1 corpus
    scans keep the plain take (their output is replicated for eval anyway).
    """
    clipped = jnp.clip(ids, 0, num_items)
    if lookup_fn is not None and ids.ndim >= 2:
        flat = clipped.reshape(ids.shape[0], -1)
        out = lookup_fn(table, flat)
        return out.reshape(*ids.shape, table.shape[-1])
    return jnp.take(table, clipped, axis=0)


class LocalEmbeddingModule(nn.Module):
    """Single dense table [num_items + 1, D], trunc-normal(0.02) init
    (`embedding_modules.py:39-73`). ``lookup_fn`` optionally replaces the
    plain take with the mesh-sharded all-to-all exchange (bound by
    `parallel/train.DistributedTrainer` when the mesh has a model axis)."""

    num_items: int
    embedding_dim: int
    lookup_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None

    @nn.compact
    def __call__(self, item_ids: jax.Array) -> jax.Array:
        table = self.param(
            "item_emb",
            truncated_normal_init(0.02),
            (self.num_items + 1, self.embedding_dim),
            jnp.float32,
        )
        emb = _lookup(table, item_ids, self.num_items, self.lookup_fn)
        return emb * (item_ids != 0)[..., None].astype(emb.dtype)


class CategoricalEmbeddingModule(nn.Module):
    """Id -> category remap before lookup (`embedding_modules.py:76-108`)."""

    num_items: int
    embedding_dim: int
    item_id_to_category_id: jax.Array  # int[num_raw_items]
    lookup_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None

    @nn.compact
    def __call__(self, item_ids: jax.Array) -> jax.Array:
        remap = jnp.asarray(self.item_id_to_category_id)
        cat = jnp.take(remap, jnp.clip(item_ids - 1, 0, remap.shape[0] - 1), axis=0) + 1
        table = self.param(
            "item_emb",
            truncated_normal_init(0.02),
            (self.num_items + 1, self.embedding_dim),
            jnp.float32,
        )
        emb = _lookup(table, cat, self.num_items, self.lookup_fn)
        return emb * (item_ids != 0)[..., None].astype(emb.dtype)
