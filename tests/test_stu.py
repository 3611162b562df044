"""STULayer/STUStack tests, mirroring the reference's module test strategy
(`modules/tests/stu_test.py`): cached_forward ≡ rows of full forward
(test_cached_forward :341), plus shape/finite checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_recommenders_tpu.modules.stu import (
    KVCache,
    STULayer,
    STULayerConfig,
    STUStack,
)


def _scatter_tail(base, lengths, tail):
    """Place tail [B, M, D] at positions [lengths[b], lengths[b]+M)."""
    B, M, D = tail.shape
    rows = jnp.arange(B)[:, None]
    cols = lengths[:, None] + jnp.arange(M)[None, :]
    return base.at[rows, cols].set(tail)


@pytest.mark.parametrize("use_group_norm", [False, True])
def test_cached_forward_equals_full_forward(use_group_norm):
    cfg = STULayerConfig(
        embedding_dim=32,
        num_heads=2,
        hidden_dim=16,
        attention_dim=16,
        output_dropout_ratio=0.0,
        use_group_norm=use_group_norm,
        attn_kernel="xla",
    )
    B, L_max, M = 4, 24, 3
    N = L_max + M
    rng = np.random.default_rng(0)
    uih_lengths = jnp.asarray([5, 24, 17, 1], jnp.int32)
    x_uih = jnp.asarray(rng.standard_normal((B, N, cfg.embedding_dim)), jnp.float32)
    # zero out invalid positions then scatter target embeddings at the tail
    valid = jnp.arange(N)[None, :] < uih_lengths[:, None]
    x_uih = x_uih * valid[:, :, None]
    targets = jnp.asarray(
        rng.standard_normal((B, M, cfg.embedding_dim)), jnp.float32
    )
    x_full = _scatter_tail(x_uih, uih_lengths, targets)
    full_lengths = uih_lengths + M
    num_targets = jnp.full((B,), M, jnp.int32)

    layer = STULayer(cfg)
    params = layer.init(
        jax.random.PRNGKey(0), x_full, full_lengths, num_targets, True
    )

    # full forward with prefill of the uih prefix
    out_full, cache = layer.apply(
        params, x_full, full_lengths, num_targets, True, uih_lengths
    )
    # delta path: score the M targets against the cache
    out_delta, new_cache = layer.apply(
        params, targets, cache, num_targets, True,
        method=STULayer.cached_forward,
    )

    rows = jnp.arange(B)[:, None]
    cols = uih_lengths[:, None] + jnp.arange(M)[None, :]
    want = out_full[rows, cols]  # [B, M, D]
    np.testing.assert_allclose(
        np.asarray(out_delta), np.asarray(want), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(new_cache.lengths), np.asarray(uih_lengths + M)
    )


def test_stack_cached_forward_matches_full():
    cfgs = tuple(
        STULayerConfig(
            embedding_dim=32, num_heads=2, hidden_dim=16, attention_dim=16,
            output_dropout_ratio=0.0, attn_kernel="xla",
        )
        for _ in range(3)
    )
    B, L_max, M = 3, 16, 2
    N = L_max + M
    rng = np.random.default_rng(1)
    uih_lengths = jnp.asarray([16, 9, 4], jnp.int32)
    x = jnp.asarray(rng.standard_normal((B, N, 32)), jnp.float32)
    x = x * (jnp.arange(N)[None, :] < uih_lengths[:, None])[:, :, None]
    targets = jnp.asarray(rng.standard_normal((B, M, 32)), jnp.float32)
    x_full = _scatter_tail(x, uih_lengths, targets)
    full_lengths = uih_lengths + M
    nt = jnp.full((B,), M, jnp.int32)

    stack = STUStack(cfgs)
    params = stack.init(jax.random.PRNGKey(0), x_full, full_lengths, nt, True)
    out_full, caches = stack.apply(
        params, x_full, full_lengths, nt, True, uih_lengths
    )
    out_delta, _ = stack.apply(
        params, targets, caches, nt, True, method=STUStack.cached_forward
    )
    rows = jnp.arange(B)[:, None]
    cols = uih_lengths[:, None] + jnp.arange(M)[None, :]
    np.testing.assert_allclose(
        np.asarray(out_delta),
        np.asarray(out_full[rows, cols]),
        rtol=3e-4,
        atol=3e-5,
    )


def test_target_positions_do_not_attend_to_each_other():
    """Target-aware masking: with num_targets=M, swapping two target rows'
    embeddings must swap their outputs (and leave others unchanged) — the
    semantic invariance behind `stu_test.py:184-323` (test_target_invariance)."""
    cfg = STULayerConfig(
        embedding_dim=16, num_heads=1, hidden_dim=8, attention_dim=8,
        output_dropout_ratio=0.0, attn_kernel="xla",
    )
    B, L, M = 2, 8, 3
    N = L + M
    rng = np.random.default_rng(2)
    lengths = jnp.full((B,), N, jnp.int32)
    nt = jnp.full((B,), M, jnp.int32)
    x = jnp.asarray(rng.standard_normal((B, N, 16)), jnp.float32)
    layer = STULayer(cfg)
    params = layer.init(jax.random.PRNGKey(0), x, lengths, nt, True)
    out = layer.apply(params, x, lengths, nt, True)
    # swap targets 0 and 2 (positions L and L+2)
    perm = list(range(N))
    perm[L], perm[L + 2] = perm[L + 2], perm[L]
    xp = x[:, jnp.asarray(perm)]
    out_p = layer.apply(params, xp, lengths, nt, True)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out[:, jnp.asarray(perm)]),
        rtol=2e-4, atol=2e-5,
    )
