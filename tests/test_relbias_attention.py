"""Differential tests: in-kernel rel-bias Pallas HSTU attention vs the XLA
composite spec (RelativeBucketedTimeAndPositionBasedBias + hstu_mha_dense),
interpret mode on CPU. TPU twins live in tests/test_pallas_tpu.py.

Reference semantics: `research/modeling/sequential/hstu.py:87-147` as
replicated by `models/hstu.py:RelativeBucketedTimeAndPositionBasedBias`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.attention_mask import make_valid_attn_mask
from generative_recommenders_tpu.ops.pallas.hstu_attention_relbias import (
    hstu_mha_dense_pallas_relbias,
    relbias_pallas_supported,
)
from generative_recommenders_tpu.ops.xla.hstu_attention import hstu_mha_dense


def _setup(seed, B, N, H, D, V, table_max_len, nb=128):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, N, H, D)).astype(np.float32) * 0.3
    k = rng.standard_normal((B, N, H, D)).astype(np.float32) * 0.3
    v = rng.standard_normal((B, N, H, V)).astype(np.float32) * 0.3
    lengths = rng.integers(1, N + 1, size=(B,)).astype(np.int32)
    lengths[0] = N
    # sorted per-row timestamps with mixed step scales (unix-like magnitudes
    # exercise the f32 cast the same way the XLA path does)
    steps = rng.integers(1, 90000, size=(B, N))
    ts = 1_600_000_000 + np.cumsum(steps, axis=1)
    pos_w = (rng.standard_normal(2 * table_max_len - 1) * 0.05).astype(
        np.float32
    )
    ts_w = (rng.standard_normal(nb + 1) * 0.05).astype(np.float32)
    return q, k, v, lengths, ts.astype(np.int64), pos_w, ts_w


def _ref_bias(ts, pos_w, ts_w, table_max_len, nb):
    """The XLA composite bias (models/hstu.py:97-125, take form)."""
    B, N = ts.shape
    Nm = table_max_len
    tsf = jnp.asarray(ts).astype(jnp.float32)
    ext = jnp.concatenate([tsf, tsf[:, -1:]], axis=1)
    i = jnp.arange(N)
    rel = i[None, :] - i[:, None] + Nm - 1
    pos_b = jnp.take(jnp.asarray(pos_w), rel, axis=0)[None]
    dt = ext[:, 1:, None] - ext[:, None, :-1]
    bucket = jnp.clip(
        jnp.floor(jnp.log(jnp.maximum(jnp.abs(dt), 1.0)) / 0.301).astype(
            jnp.int32
        ),
        0,
        nb,
    )
    return pos_b + jnp.take(jnp.asarray(ts_w), bucket, axis=0)


def _ref(q, k, v, lengths, ts, pos_w, ts_w, table_max_len, nb=128,
         alpha=1.0, num_targets=None, **mask_kw):
    B, N = q.shape[0], q.shape[1]
    mask = make_valid_attn_mask(
        N, jnp.array(lengths), causal=mask_kw.get("causal", True),
        num_targets=num_targets,
        max_attn_len=mask_kw.get("max_attn_len", 0),
        contextual_seq_len=mask_kw.get("contextual_seq_len", 0),
        min_full_attn_seq_len=mask_kw.get("min_full_attn_seq_len", 0),
    )
    pos = jnp.arange(N)
    valid_rc = (pos[None, :, None] < jnp.array(lengths)[:, None, None]) & (
        pos[None, None, :] < jnp.array(lengths)[:, None, None]
    )
    mask = jnp.logical_and(mask, valid_rc)
    bias = jnp.broadcast_to(
        _ref_bias(ts, pos_w, ts_w, table_max_len, nb), (B, N, N)
    )
    return hstu_mha_dense(
        jnp.array(q), jnp.array(k), jnp.array(v),
        alpha=alpha, max_seq_len=N, mask=mask, bias=bias,
    )


CASES = [
    dict(),
    dict(num_targets=True),
    dict(max_attn_len=37),
    dict(num_targets=True, max_attn_len=37, min_full_attn_seq_len=16),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("shape", [(3, 211, 2, 8, 8, 211), (2, 384, 2, 8, 8, 500)])
def test_relbias_fwd_matches_spec(case, shape):
    case = dict(case)
    B, N, H, D, V, Nm = shape
    q, k, v, lengths, ts, pos_w, ts_w = _setup(0, B, N, H, D, V, Nm)
    nt = None
    if case.pop("num_targets", False):
        rng = np.random.default_rng(1)
        nt = jnp.array(
            np.minimum(rng.integers(0, 6, size=(B,)), lengths - 1).clip(0)
        )
    want = _ref(
        q, k, v, lengths, ts, pos_w, ts_w, Nm, num_targets=nt, **case
    )
    got = hstu_mha_dense_pallas_relbias(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(lengths),
        jnp.array(ts), jnp.array(pos_w), jnp.array(ts_w),
        num_targets=nt, block_q=128, block_k=128, interpret=True, **case,
    )
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(got[b, : lengths[b]]),
            np.asarray(want[b, : lengths[b]]),
            rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(np.asarray(got[b, lengths[b]:]), 0.0)


@pytest.mark.parametrize(
    "case", [dict(), dict(num_targets=True, max_attn_len=37)]
)
def test_relbias_bwd_matches_spec(case):
    case = dict(case)
    B, N, H, D, V, Nm = 2, 211, 2, 8, 8, 211
    q, k, v, lengths, ts, pos_w, ts_w = _setup(3, B, N, H, D, V, Nm)
    nt = None
    if case.pop("num_targets", False):
        rng = np.random.default_rng(4)
        nt = jnp.array(
            np.minimum(rng.integers(0, 6, size=(B,)), lengths - 1).clip(0)
        )
    w = np.random.default_rng(5).standard_normal((B, N, H, V)).astype(
        np.float32
    )
    # zero the cotangent on dead rows: the spec leaves garbage there, the
    # kernel zeroes them — gradients must only flow from valid positions
    for b in range(B):
        w[b, lengths[b]:] = 0.0
    w = jnp.array(w)

    def loss_ref(q_, k_, v_, pw_, tw_):
        out = _ref(q_, k_, v_, lengths, ts, pw_, tw_, Nm, num_targets=nt, **case)
        return jnp.sum(out * w)

    def loss_pal(q_, k_, v_, pw_, tw_):
        out = hstu_mha_dense_pallas_relbias(
            q_, k_, v_, jnp.array(lengths), jnp.array(ts), pw_, tw_,
            num_targets=nt, block_q=128, block_k=128, interpret=True, **case,
        )
        return jnp.sum(out * w)

    args = (jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(pos_w),
            jnp.array(ts_w))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["dq", "dk", "dv", "dpos_w", "dts_w"]
    for name, a, b_ in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_relbias_bf16_fwd_close():
    B, N, H, D, V, Nm = 2, 211, 2, 8, 8, 211
    q, k, v, lengths, ts, pos_w, ts_w = _setup(7, B, N, H, D, V, Nm)
    want = _ref(q, k, v, lengths, ts, pos_w, ts_w, Nm)
    got = hstu_mha_dense_pallas_relbias(
        jnp.array(q, jnp.bfloat16), jnp.array(k, jnp.bfloat16),
        jnp.array(v, jnp.bfloat16), jnp.array(lengths),
        jnp.array(ts), jnp.array(pos_w), jnp.array(ts_w),
        block_q=128, block_k=128, interpret=True,
    )
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(got[b, : lengths[b]], np.float32),
            np.asarray(want[b, : lengths[b]]),
            rtol=3e-2, atol=3e-2,
        )


def test_relbias_supported_predicate():
    assert relbias_pallas_supported(4, 512, 64, 64, 2)
    assert not relbias_pallas_supported(16, 8192, 128, 128, 4)
