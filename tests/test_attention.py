"""Differential tests for HSTU attention (XLA reference) vs hand-built numpy,
plus the mask-semantics and cached==full invariance tests the reference relies
on (SURVEY.md §4: stu_test.py test_cached_forward / hstu_attention_test.py
test_cache)."""

import numpy as np
import pytest

import jax.numpy as jnp

from generative_recommenders_tpu.ops.attention_mask import make_valid_attn_mask
from generative_recommenders_tpu.ops.xla.hstu_attention import (
    delta_hstu_mha,
    hstu_mha,
    hstu_mha_dense,
)


def np_silu(x):
    return x / (1.0 + np.exp(-x))


def np_valid_mask(N, lengths, causal, num_targets, max_attn_len, ctx_len, min_full):
    """Independent numpy re-derivation of pt_hstu_attention._get_valid_attn_mask."""
    B = len(lengths)
    out = np.zeros((B, N, N), dtype=bool)
    for b in range(B):
        ids = np.arange(N)
        max_id = lengths[b]
        if ctx_len > 0:
            ids = np.maximum(ids - ctx_len + 1, 0)
            max_id = max_id - ctx_len + 1
        if num_targets is not None:
            max_id = max_id - num_targets[b]
            ids = np.minimum(ids, max_id)
        row = ids[:, None] * np.ones((1, N), dtype=int)
        col = ids[None, :] * np.ones((N, 1), dtype=int)
        dist = row - col
        if not causal:
            dist = np.abs(dist)
        valid = np.logical_or(np.eye(N, dtype=bool), dist > 0)
        if max_attn_len > 0:
            win = dist <= max_attn_len
            if min_full > 0:
                win = np.logical_or(win, row >= max_id - min_full)
            valid = np.logical_and(valid, win)
        if ctx_len > 0:
            valid = np.logical_or(valid, np.logical_and(row == 0, col < max_id))
        out[b] = valid
    return out


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize(
    "num_targets,max_attn_len,ctx_len,min_full",
    [
        (None, 0, 0, 0),
        ("rand", 0, 0, 0),
        (None, 3, 0, 0),
        ("rand", 3, 0, 0),
        ("rand", 0, 2, 0),
        ("rand", 3, 2, 2),
        (None, 4, 0, 2),
    ],
)
def test_valid_attn_mask_matches_numpy(causal, num_targets, max_attn_len, ctx_len, min_full):
    rng = np.random.default_rng(0)
    B, N = 4, 12
    lengths = rng.integers(ctx_len + 1, N + 1, size=(B,))
    nt = None
    if num_targets == "rand":
        nt = np.minimum(rng.integers(0, 4, size=(B,)), lengths - ctx_len - 1)
        nt = np.maximum(nt, 0)
    got = make_valid_attn_mask(
        N,
        jnp.array(lengths, jnp.int32),
        causal=causal,
        num_targets=None if nt is None else jnp.array(nt, jnp.int32),
        max_attn_len=max_attn_len,
        contextual_seq_len=ctx_len,
        min_full_attn_seq_len=min_full,
    )
    want = np_valid_mask(N, lengths, causal, nt, max_attn_len, ctx_len, min_full)
    np.testing.assert_array_equal(np.asarray(got), want)


def _np_hstu_mha_dense(q, k, v, alpha, max_seq_len, mask, bias=None):
    B, N, H, D = q.shape
    scores = np.einsum("bnhd,bmhd->bhnm", q, k) * alpha
    if bias is not None:
        scores = scores + bias[:, None]
    p = np_silu(scores) / max_seq_len
    p = p * mask[:, None]
    return np.einsum("bhnm,bmhv->bnhv", p, v)


def test_hstu_mha_dense_matches_numpy():
    rng = np.random.default_rng(1)
    B, N, H, D, V = 3, 8, 2, 4, 5
    q = rng.standard_normal((B, N, H, D)).astype(np.float32)
    k = rng.standard_normal((B, N, H, D)).astype(np.float32)
    v = rng.standard_normal((B, N, H, V)).astype(np.float32)
    bias = rng.standard_normal((B, N, N)).astype(np.float32)
    mask = np.tril(np.ones((N, N), np.float32))[None].repeat(B, 0)
    got = hstu_mha_dense(
        jnp.array(q), jnp.array(k), jnp.array(v),
        alpha=0.3, max_seq_len=N, mask=jnp.array(mask, jnp.bool_), bias=jnp.array(bias),
    )
    want = _np_hstu_mha_dense(q, k, v, 0.3, N, mask, bias)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def _rand_jagged_qkv(rng, B, N, H, D, V):
    lengths = rng.integers(1, N + 1, size=(B,)).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    cap = B * N
    q = np.zeros((cap, H, D), np.float32)
    k = np.zeros((cap, H, D), np.float32)
    v = np.zeros((cap, H, V), np.float32)
    tot = offsets[-1]
    q[:tot] = rng.standard_normal((tot, H, D))
    k[:tot] = rng.standard_normal((tot, H, D))
    v[:tot] = rng.standard_normal((tot, H, V))
    return lengths, offsets, q, k, v


@pytest.mark.parametrize("seed", [0, 1])
def test_hstu_mha_jagged_matches_per_row_numpy(seed):
    rng = np.random.default_rng(seed)
    B, N, H, D, V = 4, 10, 2, 3, 4
    lengths, offsets, q, k, v = _rand_jagged_qkv(rng, B, N, H, D, V)
    num_targets = np.minimum(rng.integers(0, 3, size=(B,)), lengths - 1).astype(np.int32)
    got = hstu_mha(
        N, 0.5,
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(offsets),
        causal=True, num_targets=jnp.array(num_targets), max_attn_len=4,
    )
    mask = np_valid_mask(N, lengths, True, num_targets, 4, 0, 0)
    # numpy: pad, compute, gather back per row
    for b in range(B):
        n = lengths[b]
        qb = np.zeros((1, N, H, D), np.float32)
        kb = np.zeros((1, N, H, D), np.float32)
        vb = np.zeros((1, N, H, V), np.float32)
        qb[0, :n] = q[offsets[b] : offsets[b] + n]
        kb[0, :n] = k[offsets[b] : offsets[b] + n]
        vb[0, :n] = v[offsets[b] : offsets[b] + n]
        want = _np_hstu_mha_dense(qb, kb, vb, 0.5, N, mask[b : b + 1])[0, :n]
        np.testing.assert_allclose(
            np.asarray(got)[offsets[b] : offsets[b] + n], want, rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("delta_size", [1, 3])
def test_delta_mha_equals_slice_of_full(delta_size):
    """delta_hstu_mha(last delta rows) == rows [len-delta, len) of full attention —
    the reference's test_cache invariant (hstu_attention_test.py:355-486)."""
    rng = np.random.default_rng(7)
    B, N, H, D, V = 3, 12, 2, 4, 4
    lengths = rng.integers(delta_size + 1, N + 1, size=(B,)).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    cap = B * N
    q = np.zeros((cap, H, D), np.float32)
    k = np.zeros((cap, H, D), np.float32)
    v = np.zeros((cap, H, V), np.float32)
    tot = offsets[-1]
    q[:tot] = rng.standard_normal((tot, H, D))
    k[:tot] = rng.standard_normal((tot, H, D))
    v[:tot] = rng.standard_normal((tot, H, V))
    num_targets = np.minimum(
        rng.integers(0, delta_size + 1, size=(B,)), lengths - 1
    ).astype(np.int32)

    full = np.asarray(
        hstu_mha(
            N, 0.7, jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(offsets),
            causal=True, num_targets=jnp.array(num_targets),
        )
    )
    delta_q = np.stack(
        [q[offsets[b + 1] - delta_size + i] for b in range(B) for i in range(delta_size)]
    )
    got = np.asarray(
        delta_hstu_mha(
            N, 0.7, jnp.array(delta_q), jnp.array(k), jnp.array(v),
            jnp.array(offsets), num_targets=jnp.array(num_targets),
        )
    )
    want = np.stack(
        [full[offsets[b + 1] - delta_size + i] for b in range(B) for i in range(delta_size)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
