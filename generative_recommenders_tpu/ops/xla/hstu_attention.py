"""Pure-jnp (XLA) reference implementation of HSTU attention.

This is the executable spec the Pallas kernels are differentially tested
against — the TPU twin of the reference's eager ops
(`generative_recommenders/ops/pytorch/pt_hstu_attention.py:129-235`).

HSTU attention replaces softmax with a pointwise gate:

    attn = silu(q @ k^T * alpha) / max_seq_len            (elementwise)
    attn = attn * valid_mask                              (causal/target/local)
    out  = attn @ v

Dense layout is [B, N, H, D]; the jagged API mirrors the reference dispatcher
(`generative_recommenders/ops/hstu_attention.py:44,131`) over (values, offsets).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.attention_mask import make_valid_attn_mask
from generative_recommenders_tpu.ops.jagged import (
    dense_to_jagged,
    jagged_to_padded_dense,
    offsets_to_lengths,
)


def hstu_mha_dense(
    q: jax.Array,  # [B, N, H, D]
    k: jax.Array,  # [B, N, H, D]
    v: jax.Array,  # [B, N, H, V]
    *,
    alpha: float,
    max_seq_len: int,  # normalization constant (the reference divides by N)
    mask: Optional[jax.Array] = None,  # bool/float [B or 1, N, N]; None => causal
    bias: Optional[jax.Array] = None,  # [B, N, N] additive (rel pos/ts bias)
    dropout_pr: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense HSTU multi-head attention; returns [B, N, H, V].

    Matches `pytorch_hstu_mha` (`pt_hstu_attention.py:129-171`): scores are
    silu-gated, divided by the *static* max_seq_len, and multiplicatively
    masked (no -inf / renormalization — this is not softmax).
    """
    N = q.shape[1]
    acc_dtype = jnp.float32
    scores = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=acc_dtype
    ) * jnp.asarray(alpha, acc_dtype)
    if bias is not None:
        scores = scores + bias[:, None, :, :].astype(acc_dtype)
    p = jax.nn.silu(scores) / jnp.asarray(max_seq_len, acc_dtype)
    if mask is None:
        mask = jnp.tril(jnp.ones((N, N), jnp.bool_))[None]
    p = p * mask[:, None, :, :].astype(acc_dtype)
    if dropout_pr > 0.0:
        assert dropout_rng is not None
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_pr, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_pr), 0.0)
    out = jnp.einsum("bhnm,bmhv->bnhv", p, v.astype(acc_dtype))
    return out.astype(v.dtype)


def hstu_mha(
    max_seq_len: int,
    alpha: float,
    q: jax.Array,  # jagged [L, H, D]
    k: jax.Array,  # jagged [L, H, D]
    v: jax.Array,  # jagged [L, H, V]
    seq_offsets: jax.Array,  # int32 [B + 1]
    causal: bool = True,
    num_targets: Optional[jax.Array] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    min_full_attn_seq_len: int = 0,
    dropout_pr: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Jagged HSTU attention — reference-dispatcher parity
    (`ops/hstu_attention.py:44`). Returns jagged [L, H, V]."""
    L = q.shape[0]
    H, D = q.shape[1], q.shape[2]
    V = v.shape[2]
    pq = jagged_to_padded_dense(q.reshape(L, H * D), seq_offsets, max_seq_len)
    pk = jagged_to_padded_dense(k.reshape(L, H * D), seq_offsets, max_seq_len)
    pv = jagged_to_padded_dense(v.reshape(L, H * V), seq_offsets, max_seq_len)
    B = seq_offsets.shape[0] - 1
    mask = make_valid_attn_mask(
        N=max_seq_len,
        seq_lengths=offsets_to_lengths(seq_offsets),
        causal=causal,
        num_targets=num_targets,
        max_attn_len=max_attn_len,
        contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
    )
    out = hstu_mha_dense(
        pq.reshape(B, max_seq_len, H, D),
        pk.reshape(B, max_seq_len, H, D),
        pv.reshape(B, max_seq_len, H, V),
        alpha=alpha,
        max_seq_len=max_seq_len,
        mask=mask,
        dropout_pr=dropout_pr,
        dropout_rng=dropout_rng,
    )
    return dense_to_jagged(
        out.reshape(B, max_seq_len, H * V), seq_offsets, total=L
    ).reshape(L, H, V)


def delta_hstu_mha(
    max_seq_len: int,
    alpha: float,
    delta_q: jax.Array,  # [B * delta_size, H, D] — the new (delta) query rows
    k: jax.Array,  # jagged [L, H, D] — full keys incl. cache
    v: jax.Array,  # jagged [L, H, V]
    seq_offsets: jax.Array,  # int32 [B + 1] — offsets of the FULL sequences
    num_targets: Optional[jax.Array] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
) -> jax.Array:
    """Delta-q (KV-cached / M-FALCON incremental) HSTU attention.

    Matches `pytorch_cached_hstu_mha` (`pt_hstu_attention.py:174-235`): each
    row contributes exactly ``delta_size = (B*delta)/B`` fresh queries, which
    occupy positions [len_b - delta_size, len_b) of the full sequence; they
    attend over all cached K/V under the full validity mask. Returns
    [B * delta_size, H, V].
    """
    B = seq_offsets.shape[0] - 1
    H, D = delta_q.shape[1], delta_q.shape[2]
    V = v.shape[2]
    delta_size = delta_q.shape[0] // B
    L = k.shape[0]
    lengths = offsets_to_lengths(seq_offsets)

    full_k = jagged_to_padded_dense(k.reshape(L, H * D), seq_offsets, max_seq_len)
    full_v = jagged_to_padded_dense(v.reshape(L, H * V), seq_offsets, max_seq_len)
    dq = delta_q.reshape(B, delta_size, H, D)

    acc = jnp.float32
    scores = jnp.einsum(
        "bxhd,bmhd->bhxm",
        dq,
        full_k.reshape(B, max_seq_len, H, D),
        preferred_element_type=acc,
    ) * jnp.asarray(alpha, acc)
    p = jax.nn.silu(scores) / jnp.asarray(max_seq_len, acc)

    full_mask = make_valid_attn_mask(
        N=max_seq_len,
        seq_lengths=lengths,
        causal=True,
        num_targets=num_targets,
        max_attn_len=max_attn_len,
        contextual_seq_len=contextual_seq_len,
    )  # [B, N, N]
    # Row-slice the mask at the delta-query positions: query x of batch b sits
    # at sequence position lengths[b] - delta_size + x.
    q_pos = (lengths[:, None] - delta_size) + jnp.arange(delta_size)[None, :]
    q_pos = jnp.clip(q_pos, 0, max_seq_len - 1)  # [B, delta]
    delta_mask = jnp.take_along_axis(
        full_mask, q_pos[:, :, None], axis=1
    )  # [B, delta, N]
    p = p * delta_mask[:, None, :, :].astype(acc)
    out = jnp.einsum(
        "bhxm,bmhv->bxhv", p, full_v.reshape(B, max_seq_len, H, V).astype(acc)
    )
    return out.astype(v.dtype).reshape(B * delta_size, H, V)
