"""make_delta_attn_mask must equal the corresponding rows of the full mask
(the [B, M, N] direct computation replaces the [B, N, N] materialize+slice)."""

import jax.numpy as jnp
import numpy as np
import pytest

from generative_recommenders_tpu.ops.attention_mask import (
    make_delta_attn_mask,
    make_valid_attn_mask,
)


@pytest.mark.parametrize(
    "max_attn_len,contextual,min_full",
    [(0, 0, 0), (8, 0, 0), (0, 3, 0), (8, 0, 4), (6, 2, 3)],
)
def test_delta_mask_equals_full_rows(max_attn_len, contextual, min_full):
    N, B, M = 32, 3, 4
    lengths = jnp.asarray([10, 32, 7], jnp.int32)
    nt = jnp.asarray([4, 2, 3], jnp.int32)
    full = make_valid_attn_mask(
        N, lengths, causal=True, num_targets=nt,
        max_attn_len=max_attn_len, contextual_seq_len=contextual,
        min_full_attn_seq_len=min_full,
    )
    row_idx = jnp.clip(
        lengths[:, None] - M + jnp.arange(M)[None, :], 0, N - 1
    ).astype(jnp.int32)
    want = jnp.take_along_axis(full, row_idx[:, :, None], axis=1)
    got = make_delta_attn_mask(
        N, lengths, row_idx, causal=True, num_targets=nt,
        max_attn_len=max_attn_len, contextual_seq_len=contextual,
        min_full_attn_seq_len=min_full,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------------------
# delta-q Pallas kernel vs the XLA spec (interpret mode)


@pytest.mark.parametrize(
    "case",
    [
        dict(),
        dict(num_targets=True),
        dict(max_attn_len=17),
        dict(num_targets=True, contextual_seq_len=3),
    ],
)
@pytest.mark.parametrize("M", [5, 40])
def test_delta_pallas_matches_xla(case, M):
    from generative_recommenders_tpu.ops.hstu_compute import delta_hstu_mha
    from generative_recommenders_tpu.ops.pallas.hstu_attention import (
        delta_hstu_mha_pallas,
    )

    case = dict(case)
    B, N, H, D, V = 3, 211, 2, 8, 8
    rng = np.random.default_rng(0)
    dq = jnp.array(rng.standard_normal((B, M, H, D)).astype(np.float32) * 0.3)
    k = jnp.array(rng.standard_normal((B, N, H, D)).astype(np.float32) * 0.3)
    v = jnp.array(rng.standard_normal((B, N, H, V)).astype(np.float32) * 0.3)
    lengths = rng.integers(M + 4, N + 1, size=(B,)).astype(np.int32)
    lengths[0] = N
    nt = None
    if case.pop("num_targets", False):
        nt = jnp.array(np.minimum(rng.integers(0, 5, (B,)), lengths - 1))
    want = delta_hstu_mha(
        dq, k, v, jnp.array(lengths), alpha=0.8, num_targets=nt,
        norm_len=180, **case,
    )
    got = delta_hstu_mha_pallas(
        dq, k, v, jnp.array(lengths), alpha=0.8, num_targets=nt,
        norm_len=180, interpret=True, **case,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_delta_dispatch_pallas_kernel_matches():
    """delta_hstu_mha(kernel='pallas') takes the kernel path and agrees."""
    from generative_recommenders_tpu.ops.hstu_compute import delta_hstu_mha

    B, N, M, H, D = 2, 160, 8, 2, 8
    rng = np.random.default_rng(3)
    dq = jnp.array(rng.standard_normal((B, M, H, D)).astype(np.float32))
    k = jnp.array(rng.standard_normal((B, N, H, D)).astype(np.float32))
    v = jnp.array(rng.standard_normal((B, N, H, D)).astype(np.float32))
    lengths = jnp.array([N, 100], jnp.int32)
    a = delta_hstu_mha(dq, k, v, lengths, alpha=1.0, kernel="xla")
    b = delta_hstu_mha(dq, k, v, lengths, alpha=1.0, kernel="pallas")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5)
