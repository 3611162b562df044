"""Output embedding postprocessors (research stack).

TPU twin of `research/modeling/sequential/output_postprocessors.py:36-82`.
Both are parameter-free; plain functions suffice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.normalization import layer_norm


def l2_norm_postprocess(
    output_embeddings: jax.Array, embedding_dim: int, eps: float = 1e-6
) -> jax.Array:
    x = output_embeddings[..., :embedding_dim]
    # clamp before sqrt: identical values to x / clamp(||x||, min=eps) but
    # finite gradient at x == 0 (padding rows).
    sum_sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sum_sq, eps * eps))


def layer_norm_postprocess(
    output_embeddings: jax.Array, embedding_dim: int, eps: float = 1e-6
) -> jax.Array:
    return layer_norm(output_embeddings[..., :embedding_dim], eps=eps)


def make_output_postprocessor(kind: str, embedding_dim: int, eps: float = 1e-6):
    if kind in ("l2_norm", "l2"):
        return lambda x: l2_norm_postprocess(x, embedding_dim, eps)
    if kind in ("layer_norm", "ln"):
        return lambda x: layer_norm_postprocess(x, embedding_dim, eps)
    raise ValueError(f"Unknown output postprocessor {kind}")
