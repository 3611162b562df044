"""Dynamic STU wrappers: stochastic depth + last-window (L2) execution.

TPU twin of `modules/dynamic_stu.py`:
  * SDSTU (:129-204): per-iteration coin flip skips the wrapped STU entirely
    during training (the reference freezes the rng per iteration; here the
    flip comes from the "stochastic_depth" rng stream, one flip per call);
  * L2STU (:215-304): runs the wrapped STU only on the most recent
    `max_l2_len` tokens, passing the prefix through unchanged — the paper's
    sequence-length scaling trick for upper layers.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.modules.stu import STULayer, STULayerConfig


class SDSTU(nn.Module):
    """Stochastic-depth wrapper (`dynamic_stu.py:129-204`)."""

    stu: STULayer
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        lengths: jax.Array,
        num_targets: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        out = self.stu(x, lengths, num_targets, deterministic)
        if deterministic or self.dropout_ratio <= 0.0:
            return out
        rng = self.make_rng("stochastic_depth")
        skip = jax.random.uniform(rng, ()) <= self.dropout_ratio
        return jnp.where(skip, x, out)


class L2STU(nn.Module):
    """Last-`max_l2_len`-window wrapper (`dynamic_stu.py:215-304`):
    upper layers only transform the most recent tokens; the prefix is
    passed through. Padded-dense: the window is gathered per row at
    [length - w, length), run through the STU with window lengths, and
    scattered back."""

    stu: STULayer
    max_l2_len: int
    contextual_seq_len: int = 0  # contextual prefix stays in the passthrough

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, N, D]
        lengths: jax.Array,  # int[B]
        num_targets: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        B, N, D = x.shape
        C = self.contextual_seq_len
        w = min(self.max_l2_len, N)
        # contextual tokens never enter the window (`dynamic_stu.py:238-270`
        # splits them into the prefix); the inner STU therefore runs with
        # contextual_seq_len=0 (see STUStack wiring)
        l2_lengths = jnp.maximum(jnp.minimum(lengths - C, w), 0)
        start = jnp.maximum(lengths - w, C)  # int[B]
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        cols = start[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]
        # cols < C + w + N always; gather/scatter through a w-padded copy so
        # indices are unique (clipping would alias column N-1 when
        # contextual_seq_len > N - w, making the scatter nondeterministic)
        xp = jnp.pad(x, ((0, 0), (0, w), (0, 0)))
        window = xp[rows, cols]  # [B, w, D]
        # zero the positions beyond each row's l2 length (gather clamping
        # may have duplicated tail rows there)
        valid = (
            jnp.arange(w, dtype=jnp.int32)[None, :] < l2_lengths[:, None]
        )
        window = window * valid[:, :, None].astype(window.dtype)
        out_window = self.stu(window, l2_lengths, num_targets, deterministic)
        return xp.at[rows, cols].set(
            jnp.where(valid[:, :, None], out_window, xp[rows, cols])
        )[:, :N]
