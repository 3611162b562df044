"""Small MLP building blocks shared by the production modules.

SwishLayerNorm mirrors `ops/layer_norm.py:112` (module form); the
Linear→SwishLN→Linear→LN stack mirrors the reference's content/action/item
MLPs (`modules/preprocessors.py:155-186`, `modules/dlrm_hstu.py:234-246`)
with `init_mlp_weights_optional_bias` (xavier weights, zero bias —
`research/modeling/initialization.py:20-35`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.normalization import layer_norm


class SwishLayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return x * jax.nn.sigmoid(layer_norm(x, w, b, eps=self.eps))


class LayerNormModule(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layer_norm(x, w, b, eps=self.eps)


class SwishMLP(nn.Module):
    """Linear(hidden) -> SwishLN -> Linear(out) [-> LN]."""

    hidden_dim: int
    output_dim: int
    final_layer_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            self.hidden_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="fc1",
        )(x)
        x = SwishLayerNorm(self.hidden_dim, name="sln")(x)
        x = nn.Dense(
            self.output_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="fc2",
        )(x)
        if self.final_layer_norm:
            x = LayerNormModule(self.output_dim, name="ln")(x)
        return x
