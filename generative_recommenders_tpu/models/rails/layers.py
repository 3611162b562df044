"""GLU layers. TPU twin of `research/rails/similarities/layers.py:25-80`."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _GLUBase(nn.Module):
    out_features: int

    def _lhs_rhs(self, x: jax.Array):
        w = self.param(
            "w", nn.initializers.normal(0.02),
            (x.shape[-1], self.out_features * 2),
        )
        b = self.param("b", nn.initializers.zeros, (self.out_features * 2,))
        y = x @ w + b
        return jnp.split(y, 2, axis=-1)


class GeGLU(_GLUBase):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        lhs, rhs = self._lhs_rhs(x)
        return jax.nn.gelu(lhs, approximate=False) * rhs


class SwiGLU(_GLUBase):
    """SwiGLU (arXiv:2002.05202)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        lhs, rhs = self._lhs_rhs(x)
        return jax.nn.silu(lhs) * rhs
