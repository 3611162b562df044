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


# ---------------------------------------------------------------------------
# integration: the research encoder rides the rel-bias kernel


def _encoder(attn_kernel, N):
    from generative_recommenders_tpu.models.hstu import HSTUEncoder

    return HSTUEncoder(
        embedding_dim=16,
        num_blocks=2,
        num_heads=2,
        attention_dim=8,
        linear_dim=8,
        linear_dropout_rate=0.0,
        enable_relative_attention_bias=True,
        attn_kernel=attn_kernel,
        max_total_seq_len=N,
    )


def test_encoder_relbias_pallas_matches_xla():
    """Same params, pallas(in-kernel bias) vs xla(materialized bias): valid
    positions must agree through the full 2-block encoder, fwd and grad."""
    B, N, D = 2, 211, 16
    rng = np.random.default_rng(11)
    x = jnp.array(rng.standard_normal((B, N, D)).astype(np.float32) * 0.3)
    lengths = jnp.array([N, 150], jnp.int32)
    steps = rng.integers(1, 90000, size=(B, N))
    ts = jnp.array(1_600_000_000 + np.cumsum(steps, axis=1))

    enc_x = _encoder("xla", N)
    enc_p = _encoder("pallas", N)
    params = enc_x.init(jax.random.PRNGKey(0), x, lengths, ts, True)

    out_x = enc_x.apply(params, x, lengths, ts, True)
    out_p = enc_p.apply(params, x, lengths, ts, True)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out_p[b, : lengths[b]]),
            np.asarray(out_x[b, : lengths[b]]),
            rtol=2e-4, atol=2e-4,
        )

    vmask = (jnp.arange(N)[None, :] < lengths[:, None])[..., None]

    def loss(enc):
        def f(p):
            out = enc.apply(p, x, lengths, ts, True)
            return jnp.sum(jnp.where(vmask, out, 0.0) ** 2)
        return f

    g_x = jax.grad(loss(enc_x))(params)
    g_p = jax.grad(loss(enc_p))(params)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_x)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_p)
    for (path, a), (_, b_) in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_encoder_relbias_pallas_no_bnn_in_hlo():
    """The compiled train-style step must not contain any [B, N, N] tensor
    when the in-kernel bias path is active (VERDICT round-2 #1 'Done'
    criterion), while the XLA fallback does."""
    B, N = 2, 256
    rng = np.random.default_rng(13)
    x = jnp.array(rng.standard_normal((B, N, 16)).astype(np.float32) * 0.3)
    lengths = jnp.array([N, 200], jnp.int32)
    ts = jnp.array(
        1_600_000_000 + np.cumsum(rng.integers(1, 90000, (B, N)), axis=1)
    )

    def hlo_for(kernel):
        enc = _encoder(kernel, N)
        params = enc.init(jax.random.PRNGKey(0), x, lengths, ts, True)

        def step(p):
            out = enc.apply(p, x, lengths, ts, True)
            return jnp.sum(out ** 2)

        return jax.jit(jax.grad(step)).lower(params).compile().as_text()

    marker = f"{B},{N},{N}"
    hlo_p = hlo_for("pallas").replace(" ", "")
    assert marker not in hlo_p, "[B,N,N] tensor found on the pallas path"
    hlo_x = hlo_for("xla").replace(" ", "")
    assert marker in hlo_x  # sanity: the fallback does materialize it
