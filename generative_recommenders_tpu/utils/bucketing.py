"""Sequence-length utilities: stochastic length (SL) + static bucketing.

TPU twins of `common.py:204-216` (apply_sampling — the paper's stochastic
length: keep long sequences with probability proportional to (N^alpha)/n^2)
and `common.py:250-289` (prev_power_of_2 / autotune_max_seq_len — static
seq-len bucketing that avoids Triton re-autotunes there and jit recompiles
here: pick the padded length from a fixed menu so XLA compiles once per
bucket).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def apply_stochastic_length(
    lengths: jax.Array,  # int[B]
    alpha: float,
    max_seq_len: int,
    rng: jax.Array,
) -> jax.Array:
    """`common.py:204-216`: rows longer than N^(alpha/2) are truncated to
    that threshold w.p. 1 - N^alpha / n^2."""
    threshold = int(max_seq_len ** (alpha / 2))
    lf = lengths.astype(jnp.float32)
    no_sample_prob = (max_seq_len**alpha) / jnp.square(lf)
    u = jax.random.uniform(rng, lengths.shape)
    sample = jnp.logical_and(lengths > threshold, u < 1.0 - no_sample_prob)
    return jnp.where(sample, threshold, lengths).astype(lengths.dtype)


def truncate_to_stochastic_length(
    ids: jax.Array,  # int[B, N] (chronological, left-aligned)
    lengths: jax.Array,
    new_lengths: jax.Array,
    extra_positions: int = 0,
) -> jax.Array:
    """Keeps the most recent ``new_lengths`` events per row (shift left).

    ``extra_positions`` keeps that many slots past the new length — the
    timestamps array carries the target timestamp scattered at position
    ``lengths`` (`features.py:42-44`), which the shift relocates to
    ``new_lengths`` and must survive the mask."""
    B, N = ids.shape
    shift = (lengths - new_lengths).astype(jnp.int32)  # >= 0
    cols = jnp.arange(N, dtype=jnp.int32)[None, :] + shift[:, None]
    gathered = jnp.take_along_axis(ids, jnp.clip(cols, 0, N - 1), axis=1)
    keep = (
        jnp.arange(N, dtype=jnp.int32)[None, :]
        < (new_lengths + extra_positions)[:, None]
    )
    return jnp.where(keep, gathered, 0)


def prev_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (int(x).bit_length() - 1)


def autotune_max_seq_len(
    runtime_max_seq_len: int,
    static_max_seq_lens: Optional[Sequence[int]] = None,
    use_runtime: bool = False,
) -> int:
    """`common.py:276-289`: choose the compile bucket for a batch's true max
    length — smallest static bucket covering it, or the previous power of 2
    in runtime mode."""
    if use_runtime or not static_max_seq_lens:
        return prev_power_of_2(runtime_max_seq_len)
    for m in sorted(static_max_seq_lens):
        if m >= runtime_max_seq_len:
            return m
    return sorted(static_max_seq_lens)[-1]


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << ((int(x) - 1).bit_length())


def bucket_batch(
    batch: dict,
    static_max_seq_lens: Optional[Sequence[int]] = None,
    use_runtime: bool = False,
) -> dict:
    """Compile-bucket a research batch by its true max history length
    (`common.py:250-289` wired into the train path, VERDICT round-1 #6).

    Slices every [B, max_seq_len] array down to the smallest bucket (or the
    next power of 2 in runtime mode) covering the batch's longest row —
    jit then keeps one compiled executable per bucket instead of always
    paying the full padded width. Never truncates real events: falls back
    to the full width when no bucket covers the batch.
    """
    lengths = np.asarray(batch["history_lengths"])
    runtime = int(lengths.max()) if lengths.size else 1
    full = batch["historical_ids"].shape[1]
    if use_runtime or not static_max_seq_lens:
        width = min(next_power_of_2(runtime), full)
    else:
        covering = [m for m in sorted(static_max_seq_lens) if m >= runtime]
        width = min(covering[0], full) if covering else full
    if width >= full:
        return batch
    out = {}
    for k, v in batch.items():
        if getattr(v, "ndim", 0) == 2 and v.shape[1] == full:
            out[k] = v[:, :width]
        else:
            out[k] = v
    return out
