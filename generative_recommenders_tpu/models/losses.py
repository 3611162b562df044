"""Autoregressive losses (research stack), dense-masked form.

TPU twin of `research/modeling/sequential/losses/sampled_softmax.py:29-193`
and `autoregressive_losses.py:262-479`.  The reference flattens to jagged
and computes per-valid-position losses; here we stay dense [B, N] with a
weight mask — mathematically identical because the weights are zero exactly
on the positions the jagged form drops.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def sampled_softmax_loss_from_logits(
    pos_logits: jax.Array,  # [B, N] — raw similarity of positives
    neg_logits: jax.Array,  # [B, N, R] — raw similarity of sampled negatives
    supervision_ids: jax.Array,  # int[B, N]
    supervision_weights: jax.Array,  # float[B, N]
    sampled_ids: jax.Array,  # int[B, N, R]
    softmax_temperature: float,
) -> jax.Array:
    """Sampled softmax with -5e4 masking of positive/negative id collisions
    (`sampled_softmax.py:44-87`), from precomputed similarity logits (works
    for both dot-product and MoL similarities)."""
    pos_logits = pos_logits.astype(jnp.float32) / softmax_temperature
    neg_logits = jnp.where(
        supervision_ids[..., None] == sampled_ids,
        -5e4,
        neg_logits.astype(jnp.float32) / softmax_temperature,
    )  # [B, N, R]
    logits = jnp.concatenate([pos_logits[..., None], neg_logits], axis=-1)
    per_pos = -jax.nn.log_softmax(logits, axis=-1)[..., 0]  # [B, N]
    w = supervision_weights.astype(per_pos.dtype)
    return jnp.sum(per_pos * w) / jnp.maximum(jnp.sum(w), 1e-6)


def sampled_softmax_loss(
    output_embeddings: jax.Array,  # [B, N, D] — encoder outputs (postprocessed)
    supervision_embeddings: jax.Array,  # [B, N, D] — positives (normalized)
    supervision_ids: jax.Array,  # int[B, N]
    supervision_weights: jax.Array,  # float[B, N]
    sampled_ids: jax.Array,  # int[B, N, R]
    sampled_negative_embeddings: jax.Array,  # [B, N, R, D] (normalized)
    softmax_temperature: float,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Dot-product sampled softmax (`sampled_softmax.py:44-87`)."""
    pos_logits = jnp.einsum(
        "bnd,bnd->bn", output_embeddings, supervision_embeddings,
        preferred_element_type=jnp.float32,
    )  # [B, N]
    neg_logits = jnp.einsum(
        "bnd,bnrd->bnr", output_embeddings, sampled_negative_embeddings,
        preferred_element_type=jnp.float32,
    )
    loss = sampled_softmax_loss_from_logits(
        pos_logits, neg_logits, supervision_ids, supervision_weights,
        sampled_ids, softmax_temperature,
    )
    return loss, {}


def bce_loss(
    output_embeddings: jax.Array,  # [B, N, D]
    supervision_embeddings: jax.Array,  # [B, N, D]
    supervision_ids: jax.Array,  # int[B, N]
    supervision_weights: jax.Array,  # float[B, N]
    sampled_ids: jax.Array,  # int[B, N, 1]
    sampled_negative_embeddings: jax.Array,  # [B, N, 1, D]
    temperature: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """BCE with one sampled negative (`autoregressive_losses.py:262-328`)."""
    pos_logits = jnp.einsum(
        "bnd,bnd->bn", output_embeddings, supervision_embeddings,
        preferred_element_type=jnp.float32,
    ) / temperature
    neg_logits = jnp.einsum(
        "bnd,bnd->bn", output_embeddings, sampled_negative_embeddings[:, :, 0, :],
        preferred_element_type=jnp.float32,
    ) / temperature
    valid_neg = (supervision_ids != sampled_ids[..., 0]).astype(jnp.float32)
    weights = supervision_weights.astype(jnp.float32) * valid_neg
    losses = (
        _bce_with_logits(pos_logits, jnp.ones_like(pos_logits))
        + _bce_with_logits(neg_logits, jnp.zeros_like(neg_logits))
    ) * weights * 0.5
    return jnp.sum(losses) / jnp.maximum(jnp.sum(weights), 1e-6), {}


def bce_loss_with_ratings(
    output_embeddings: jax.Array,
    supervision_embeddings: jax.Array,
    supervision_ratings: jax.Array,  # [B, N]
    supervision_weights: jax.Array,
    temperature: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Rating-supervised BCE (`autoregressive_losses.py:382-479`)."""
    logits = jnp.einsum(
        "bnd,bnd->bn", output_embeddings, supervision_embeddings,
        preferred_element_type=jnp.float32,
    ) / temperature
    w = supervision_weights.astype(jnp.float32)
    losses = _bce_with_logits(logits, supervision_ratings.astype(jnp.float32)) * w
    return jnp.sum(losses) / jnp.maximum(jnp.sum(w), 1e-6), {}


def _bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
