"""Normalization ops (XLA): layer norm / RMS norm / swish layer norm.

TPU twin of the reference dispatcher `generative_recommenders/ops/layer_norm.py:46-161`
(backed there by `ops/triton/triton_layer_norm.py`). XLA fuses these into
surrounding matmuls, so a Pallas kernel is unnecessary for the standalone
forms; the fused ln·u·dropout+matmul epilogues live in the Pallas package.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(
    x: jax.Array,
    weight: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """LayerNorm over the last dim, fp32 statistics (reference `ops/layer_norm.py:46`)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(
    x: jax.Array, weight: Optional[jax.Array] = None, eps: float = 1e-6
) -> jax.Array:
    """RMSNorm (reference `ops/layer_norm.py:139`)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(ms + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def swish_layer_norm(
    x: jax.Array,
    weight: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """x * sigmoid(LN(x)) (reference `ops/layer_norm.py:79,161`)."""
    return x * jax.nn.sigmoid(layer_norm(x, weight, bias, eps))


def group_norm(
    x: jax.Array,  # [..., num_groups * group_dim]
    num_groups: int,
    weight: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Per-head group norm used by the production STU
    (`ops/triton/triton_hstu_linear.py` group_norm_mul_dropout)."""
    shape = x.shape
    g = x.reshape(shape[:-1] + (num_groups, shape[-1] // num_groups)).astype(
        jnp.float32
    )
    mean = jnp.mean(g, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=-1, keepdims=True)
    y = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(shape)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
