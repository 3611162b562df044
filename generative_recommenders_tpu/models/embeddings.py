"""Item embedding modules (research stack).

TPU twin of `research/modeling/sequential/embedding_modules.py:25-108`.
``padding_idx=0`` semantics are realized by masking the lookup with
``(ids != 0)`` — id 0 always embeds to 0 and receives no gradient.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def truncated_normal_init(stddev: float):
    """torch ``truncated_normal(std)`` twin: N(0, std) truncated at ±2σ."""
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


class LocalEmbeddingModule(nn.Module):
    """Single dense table [num_items + 1, D], trunc-normal(0.02) init
    (`embedding_modules.py:39-73`)."""

    num_items: int
    embedding_dim: int

    @nn.compact
    def __call__(self, item_ids: jax.Array) -> jax.Array:
        table = self.param(
            "item_emb",
            truncated_normal_init(0.02),
            (self.num_items + 1, self.embedding_dim),
            jnp.float32,
        )
        emb = jnp.take(table, jnp.clip(item_ids, 0, self.num_items), axis=0)
        return emb * (item_ids != 0)[..., None].astype(emb.dtype)


class CategoricalEmbeddingModule(nn.Module):
    """Id -> category remap before lookup (`embedding_modules.py:76-108`)."""

    num_items: int
    embedding_dim: int
    item_id_to_category_id: jax.Array  # int[num_raw_items]

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
        emb = jnp.take(table, jnp.clip(cat, 0, self.num_items), axis=0)
        return emb * (item_ids != 0)[..., None].astype(emb.dtype)
