"""Research-stack KV-cached encode (delta_x_offsets twin) parity tests:
prefill + encode_delta must equal a full re-encode of the extended sequence
(`research/modeling/sequential/hstu.py:147-223,284-444`; VERDICT round-1
missing #2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_recommenders_tpu.models.sequential import (
    ModelConfig,
    SequentialRecommender,
)


def _build(enable_bias: bool, num_items=60, N=12, D=16):
    cfg = ModelConfig(
        main_module="HSTU",
        num_items=num_items,
        max_sequence_len=N,
        gr_output_length=1,
        item_embedding_dim=D,
        num_blocks=2,
        num_heads=2,
        dqk=8,
        dv=8,
        attn_kernel="xla",
        enable_relative_attention_bias=enable_bias,
    )
    return SequentialRecommender(cfg), cfg


@pytest.mark.parametrize("enable_bias", [True, False], ids=["rel_bias", "no_bias"])
@pytest.mark.parametrize("M", [1, 3], ids=["delta1", "delta3"])
def test_encode_delta_matches_full(enable_bias, M):
    model, cfg = _build(enable_bias)
    B = 4
    Ncap = cfg.total_seq_len  # padded prefill width
    rng = np.random.default_rng(0)
    lengths = jnp.asarray(rng.integers(3, Ncap - M, size=(B,)), jnp.int32)
    ids = np.zeros((B, Ncap), np.int32)
    ts = np.zeros((B, Ncap), np.int64)
    for b in range(B):
        n = int(lengths[b])
        ids[b, :n] = rng.integers(1, cfg.num_items, size=n)
        ts[b, :n] = np.sort(rng.integers(1, 1 << 20, size=n))
    delta_ids = jnp.asarray(rng.integers(1, cfg.num_items, size=(B, M)), jnp.int32)
    delta_ts = np.zeros((B, M), np.int64)
    for b in range(B):
        delta_ts[b] = ts[b, int(lengths[b]) - 1] + np.arange(1, M + 1) * 100

    ids = jnp.asarray(ids)
    payloads = {
        "timestamps": jnp.asarray(ts),
        "ratings": jnp.ones((B, Ncap), jnp.int32),
    }
    init_rng = jax.random.PRNGKey(0)
    params = model.init(
        init_rng, lengths, ids, payloads,
        method=SequentialRecommender.initialize,
    )

    emb = lambda x: model.apply(
        params, x, method=SequentialRecommender.get_item_embeddings
    )

    # full reference: delta tokens scattered into the reserved target slots
    # of the same padded width Ncap (lengths <= Ncap - M guarantees room)
    rows = jnp.arange(B)[:, None]
    cols = lengths[:, None] + jnp.arange(M)[None, :]
    full_ids = ids.at[rows, cols].set(delta_ids)
    full_ts = payloads["timestamps"].at[rows, cols].set(jnp.asarray(delta_ts))
    full_payloads = {
        "timestamps": full_ts,
        "ratings": jnp.ones((B, Ncap), jnp.int32),
    }
    want = model.apply(
        params, lengths + M, full_ids, emb(full_ids), full_payloads, True,
        method=SequentialRecommender.encode,
    )

    # cached: prefill the prefix at the same padded width, trim the cache to
    # Ncap - M (dead columns only) so the delta append reproduces width Ncap
    # — identical silu normalizer and bias window as the full run.
    # The rel time bias of row i reads ts[i+1] (the reference's target-aware
    # time feature), so the prefill timestamps must carry the next (first
    # delta) timestamp at position `lengths` — exactly the layout
    # seq_features_from_row produces via its target-ts scatter.
    prefill_ts = payloads["timestamps"].at[
        jnp.arange(B), lengths
    ].set(jnp.asarray(delta_ts)[:, 0])
    prefill_payloads = {**payloads, "timestamps": prefill_ts}
    _, caches = model.apply(
        params, lengths, ids, emb(ids), prefill_payloads, M,
        method=SequentialRecommender.encode_with_cache,
    )
    got, new_caches = model.apply(
        params, lengths, delta_ids, emb(delta_ids), full_payloads, caches,
        method=SequentialRecommender.encode_delta,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )
    assert new_caches[0][0].shape[1] == Ncap
