"""Differential tests: Pallas flash-HSTU kernels vs the XLA executable spec
(interpret mode on CPU — the reference's Triton-vs-eager test pattern,
`ops/tests/hstu_attention_test.py:35-163`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.attention_mask import make_valid_attn_mask
from generative_recommenders_tpu.ops.pallas.hstu_attention import (
    hstu_mha_dense_pallas,
)
from generative_recommenders_tpu.ops.xla.hstu_attention import hstu_mha_dense


def _setup(seed, B, N, H, D, V, ctx_len=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, N, H, D)).astype(np.float32) * 0.3
    k = rng.standard_normal((B, N, H, D)).astype(np.float32) * 0.3
    v = rng.standard_normal((B, N, H, V)).astype(np.float32) * 0.3
    lengths = rng.integers(max(1, ctx_len + 1), N + 1, size=(B,)).astype(np.int32)
    lengths[0] = N  # always one full row
    return q, k, v, lengths


def _ref(q, k, v, lengths, *, alpha, num_targets=None, **mask_kw):
    B, N = q.shape[0], q.shape[1]
    mask = make_valid_attn_mask(
        N, jnp.array(lengths), causal=mask_kw.get("causal", True),
        num_targets=num_targets,
        max_attn_len=mask_kw.get("max_attn_len", 0),
        contextual_seq_len=mask_kw.get("contextual_seq_len", 0),
        min_full_attn_seq_len=mask_kw.get("min_full_attn_seq_len", 0),
    )
    # dense-layout row/col < length guard (jagged parity)
    pos = jnp.arange(N)
    valid_rc = (pos[None, :, None] < jnp.array(lengths)[:, None, None]) & (
        pos[None, None, :] < jnp.array(lengths)[:, None, None]
    )
    mask = jnp.logical_and(mask, valid_rc)
    return hstu_mha_dense(
        jnp.array(q), jnp.array(k), jnp.array(v),
        alpha=alpha, max_seq_len=N, mask=mask,
    )


CASES = [
    dict(),
    dict(num_targets=True),
    dict(max_attn_len=5),
    dict(num_targets=True, max_attn_len=5),
    dict(num_targets=True, contextual_seq_len=3),
    dict(max_attn_len=6, min_full_attn_seq_len=4),
    dict(causal=False),
]


@pytest.mark.parametrize("case", CASES)
def test_pallas_fwd_matches_spec(case):
    case = dict(case)
    B, N, H, D, V = 3, 24, 2, 8, 8
    ctx = case.get("contextual_seq_len", 0)
    q, k, v, lengths = _setup(0, B, N, H, D, V, ctx)
    nt = None
    if case.pop("num_targets", False):
        rng = np.random.default_rng(1)
        nt = jnp.array(
            np.minimum(rng.integers(0, 4, size=(B,)), lengths - ctx - 1).clip(0)
        )
    want = _ref(q, k, v, lengths, alpha=0.7, num_targets=nt, **case)
    got = hstu_mha_dense_pallas(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(lengths),
        alpha=0.7, num_targets=nt, block_q=8, block_k=8, interpret=True, **case,
    )
    # spec leaves garbage at rows >= length; kernel zeroes them — compare valid rows
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(got[b, : lengths[b]]), np.asarray(want[b, : lengths[b]]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(np.asarray(got[b, lengths[b]:]), 0.0)


@pytest.mark.parametrize(
    "case", [dict(), dict(num_targets=True, max_attn_len=5)]
)
def test_pallas_bwd_matches_spec(case):
    case = dict(case)
    B, N, H, D, V = 2, 16, 2, 8, 8
    q, k, v, lengths = _setup(3, B, N, H, D, V)
    nt = None
    if case.pop("num_targets", False):
        rng = np.random.default_rng(1)
        nt = jnp.array(np.minimum(rng.integers(0, 3, size=(B,)), lengths - 1).clip(0))
    rng = np.random.default_rng(9)
    # random cotangent restricted to valid rows
    ct = rng.standard_normal((B, N, H, V)).astype(np.float32)
    for b in range(B):
        ct[b, lengths[b]:] = 0.0
    ct = jnp.array(ct)

    def loss_ref(q_, k_, v_):
        out = _ref(
            np.asarray(q_), np.asarray(k_), np.asarray(v_), lengths,
            alpha=0.7, num_targets=nt, **case,
        )
        return jnp.sum(out * ct)

    def loss_ref_traced(q_, k_, v_):
        maskkw = dict(case)
        mask = make_valid_attn_mask(
            N, jnp.array(lengths), causal=maskkw.get("causal", True),
            num_targets=nt, max_attn_len=maskkw.get("max_attn_len", 0),
        )
        pos = jnp.arange(N)
        valid_rc = (pos[None, :, None] < jnp.array(lengths)[:, None, None]) & (
            pos[None, None, :] < jnp.array(lengths)[:, None, None]
        )
        out = hstu_mha_dense(
            q_, k_, v_, alpha=0.7, max_seq_len=N,
            mask=jnp.logical_and(mask, valid_rc),
        )
        return jnp.sum(out * ct)

    def loss_pallas(q_, k_, v_):
        out = hstu_mha_dense_pallas(
            q_, k_, v_, jnp.array(lengths), alpha=0.7, num_targets=nt,
            block_q=8, block_k=8, interpret=True, **case,
        )
        return jnp.sum(out * ct)

    args = (jnp.array(q), jnp.array(k), jnp.array(v))
    g_ref = jax.grad(loss_ref_traced, argnums=(0, 1, 2))(*args)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(*args)
    for name, a, b_ in zip(("dq", "dk", "dv"), g_ref, g_pal):
        a_np, b_np = np.array(a), np.array(b_)
        # grads at rows >= length may differ (dead rows); zero them in both
        for bb in range(B):
            a_np[bb, lengths[bb]:] = 0.0
            b_np[bb, lengths[bb]:] = 0.0
        np.testing.assert_allclose(b_np, a_np, rtol=1e-4, atol=1e-5, err_msg=name)


def test_unaligned_block_shapes_match_spec():
    """Regression: padded N not divisible by the default block sizes used to
    clamp the resident-kernel pl.ds slices and silently attend wrong rows
    (e.g. serving shape uih=512+40 -> N=552 -> padded 640 with bk=256)."""
    import numpy as np

    from generative_recommenders_tpu.ops.attention_mask import (
        apply_padding_guard,
        make_valid_attn_mask,
    )
    from generative_recommenders_tpu.ops.pallas.hstu_attention import (
        hstu_mha_dense_pallas,
    )
    from generative_recommenders_tpu.ops.xla.hstu_attention import (
        hstu_mha_dense,
    )

    for N in (384, 552):
        B, H, D = 2, 2, 32
        rng = np.random.default_rng(N)
        lengths = jnp.asarray([N, N - 7], jnp.int32)
        mk = lambda: jnp.asarray(rng.standard_normal((B, N, H, D)) * 0.3,
                                 jnp.float32)
        q, k, v = mk(), mk(), mk()
        alpha = 1.0 / D**0.5

        def loss_p(q, k, v):
            o = hstu_mha_dense_pallas(
                q, k, v, lengths=lengths, alpha=alpha, max_seq_len=N,
                causal=True,
            )
            return jnp.sum(o * o), o

        mask = apply_padding_guard(
            make_valid_attn_mask(N, lengths, causal=True), lengths
        )

        def loss_x(q, k, v):
            o = hstu_mha_dense(q, k, v, alpha=alpha, max_seq_len=N, mask=mask)
            return jnp.sum(o * o), o

        (_, o_p), g_p = jax.value_and_grad(loss_p, (0, 1, 2), has_aux=True)(q, k, v)
        (_, o_x), g_x = jax.value_and_grad(loss_x, (0, 1, 2), has_aux=True)(q, k, v)
        np.testing.assert_allclose(
            np.asarray(o_p), np.asarray(o_x), rtol=2e-4, atol=2e-5,
            err_msg=f"N={N} fwd",
        )
        for nm, a, b in zip("dq dk dv".split(), g_p, g_x):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=f"N={N} {nm}",
            )


def test_residency_selection():
    """The flagship B8xN2048xH4xD64 bf16 shape must use the resident-KV
    kernels in BOTH directions (regression: a budget-formula fix once
    silently evicted the backward to the slower 3-D grid)."""
    from generative_recommenders_tpu.ops.pallas import hstu_attention as pa

    assert pa._use_resident(4, 2048, 64, 64, 2)
    assert pa._use_resident_bwd(4, 2048, 64, 64, 2)
    assert pa._use_resident(4, 4096, 64, 64, 2)       # fwd still resident
    assert not pa._use_resident_bwd(4, 4096, 64, 64, 2)  # bwd -> 3-D grid
    assert not pa._use_resident(4, 8192, 64, 64, 2)


def test_residency_dual_gate_r5():
    """Round-5 regressions pinned:
    - the H8/D32 long-N BACKWARD must not be resident (21 MB of lane-padded
      residency — the r4 Mosaic compile crash; the 8 MB-padded forward is
      chip-verified resident);
    - f32 D=128 N=1280 must NOT take the resident backward (17.5 MB scoped
      VMEM vs the 16 MB limit — the uih=1024/M=40 serving crash);
    - the serving bf16 forward must STAY resident (the 73 TF/s bucket)."""
    from generative_recommenders_tpu.ops.pallas import hstu_attention as pa

    assert pa._use_resident(8, 2048, 32, 32, 2)
    assert not pa._use_resident_bwd(8, 2048, 32, 32, 2)
    assert not pa._use_resident_bwd(4, 1280, 128, 128, 4)
    # serving bf16: resident fwd; the bwd has always run the split path
    # (6.55 MB nominal vs the 6 MB measured envelope) — the 73 TF/s bucket
    # was measured with exactly this dispatch
    assert pa._use_resident(4, 1280, 128, 128, 2)
    assert not pa._use_resident_bwd(4, 1280, 128, 128, 2)
    assert pa._use_resident(8, 640, 32, 32, 2)  # ml-3b stays resident


def test_two_tier_nondividing_bk_matches_spec():
    """The two-tier forward engages when block_k does not divide the padded
    N (N=1152 pads to 1280; bk=512 does not divide) and must match the XLA
    spec bit-for-bit-ish in both directions — the legacy path would have
    halved bk instead."""
    import jax

    from generative_recommenders_tpu.ops.pallas.hstu_attention import (
        hstu_mha_dense_pallas,
    )
    from generative_recommenders_tpu.ops.xla.hstu_attention import (
        hstu_mha_dense,
    )

    B, N, H, D = 2, 1152, 2, 64
    rng = np.random.default_rng(11)
    lengths = jnp.asarray([1152, 700], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, N, H, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)) * 0.3, jnp.float32)
    mask_rows = jnp.arange(N)[:, None] >= jnp.arange(N)[None, :]
    valid = jnp.arange(N)[None, :] < lengths[:, None]
    mask = mask_rows[None] & valid[:, :, None] & valid[:, None, :]

    def loss_p(q, k, v):
        o = hstu_mha_dense_pallas(
            q, k, v, lengths=lengths, alpha=0.125, max_seq_len=N,
            causal=True, block_q=256, block_k=512, interpret=True,
        )
        return jnp.sum(o * o), o

    def loss_x(q, k, v):
        o = hstu_mha_dense(q, k, v, alpha=0.125, max_seq_len=N, mask=mask)
        return jnp.sum(o * o), o

    (_, o_p), g_p = jax.value_and_grad(loss_p, (0, 1, 2), has_aux=True)(q, k, v)
    (_, o_x), g_x = jax.value_and_grad(loss_x, (0, 1, 2), has_aux=True)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(o_p), np.asarray(o_x), rtol=2e-4, atol=2e-5
    )
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=3e-5
        )
