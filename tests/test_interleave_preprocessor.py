"""ContextualInterleavePreprocessor tests: interleaving layout (training vs
inference target handling), contextual prefix, parameterized MLPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_recommenders_tpu.modules.action_encoder import (
    ActionEncoder,
    ContentEncoder,
)
from generative_recommenders_tpu.modules.contextual_interleave_preprocessor import (
    ContextualInterleavePreprocessor,
)


def _build(use_pmlp, ctx=()):
    return ContextualInterleavePreprocessor(
        input_embedding_dim=8,
        output_embedding_dim=12,
        contextual_feature_to_max_length=ctx,
        contextual_feature_to_min_uih_length=(),
        content_encoder=ContentEncoder(input_embedding_dim=8),
        action_encoder=ActionEncoder(
            action_embedding_dim=4,
            action_feature_name="w",
            action_weights=(1, 2),
        ),
        use_parameterized_mlps=use_pmlp,
        mlp_hidden_dim=16,
        enable_interleaving=True,
    )


@pytest.mark.parametrize("use_pmlp", [False, True])
def test_interleave_layouts(use_pmlp):
    B, N = 2, 6
    rng = np.random.default_rng(0)
    uih_lengths = jnp.asarray([3, 4], jnp.int32)
    num_targets = jnp.asarray([2, 1], jnp.int32)
    seq_lengths = uih_lengths + num_targets
    emb = jnp.asarray(rng.standard_normal((B, N, 8)), jnp.float32)
    ts = jnp.asarray(rng.integers(1, 100, (B, N)), jnp.int32)
    w = jnp.asarray(rng.integers(0, 4, (B, N)), jnp.int32)
    payloads = {"w": w}
    ctx = (("u", 1),) if use_pmlp else ()
    pre = _build(use_pmlp, ctx)
    if use_pmlp:
        payloads["u"] = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
    params = pre.init(
        jax.random.PRNGKey(0), emb, seq_lengths, ts, uih_lengths,
        num_targets, payloads, True,
    )
    # inference: targets NOT interleaved
    out = pre.apply(
        params, emb, seq_lengths, ts, uih_lengths, num_targets, payloads, True
    )
    C = pre.max_contextual_seq_len
    np.testing.assert_array_equal(
        np.asarray(out.seq_lengths), np.asarray(2 * uih_lengths + num_targets + C)
    )
    np.testing.assert_array_equal(
        np.asarray(out.num_targets), np.asarray(num_targets)
    )
    # timestamps: pairs share ts; targets appear once
    row0 = np.asarray(out.seq_timestamps[0])[C:]
    want0 = [ts[0, 0], ts[0, 0], ts[0, 1], ts[0, 1], ts[0, 2], ts[0, 2],
             ts[0, 3], ts[0, 4]]
    np.testing.assert_array_equal(row0[: len(want0)], np.asarray(want0))

    # training: targets interleaved too
    out_t = pre.apply(
        params, emb, seq_lengths, ts, uih_lengths, num_targets, payloads,
        False, rngs={"dropout": jax.random.PRNGKey(1)},
    )
    np.testing.assert_array_equal(
        np.asarray(out_t.seq_lengths), np.asarray(2 * seq_lengths + C)
    )
    np.testing.assert_array_equal(
        np.asarray(out_t.num_targets), np.asarray(2 * num_targets)
    )
