"""Model-level semantic tests: causality, padding invariance, shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_recommenders_tpu.models.sequential import (
    ModelConfig,
    SequentialRecommender,
    get_current_embeddings,
)


def _make(model="HSTU", **kw):
    cfg = ModelConfig(
        main_module=model, num_items=50, max_sequence_len=12, gr_output_length=2,
        item_embedding_dim=16, num_blocks=2, num_heads=2, dqk=8, dv=8,
        ffn_hidden_dim=16, **kw,
    )
    return cfg, SequentialRecommender(cfg)


def _init(model, cfg, B, rng):
    N = cfg.total_seq_len
    return model.init(
        rng,
        jnp.ones((B,), jnp.int32),
        jnp.zeros((B, N), jnp.int32),
        {"timestamps": jnp.zeros((B, N), jnp.int32),
         "ratings": jnp.zeros((B, N), jnp.int32)},
        method=SequentialRecommender.initialize,
    )


@pytest.mark.parametrize("main_module", ["HSTU", "SASRec"])
def test_causality(main_module):
    """Changing tokens at positions > i must not change outputs at <= i."""
    cfg, model = _make(main_module)
    B, N = 2, cfg.total_seq_len
    rng = jax.random.PRNGKey(0)
    params = _init(model, cfg, B, rng)
    ids = jax.random.randint(rng, (B, N), 1, 51)
    ts = jnp.cumsum(jax.random.randint(rng, (B, N), 60, 600), axis=1) + 10**9
    lengths = jnp.array([N, N], jnp.int32)

    @jax.jit
    def run(ids):
        emb = model.apply(params, ids, method=SequentialRecommender.get_item_embeddings)
        return model.apply(
            params, lengths, ids, emb, {"timestamps": ts}, True
        )

    out1 = run(ids)
    cut = 5
    ids2 = ids.at[:, cut:].set(1)  # perturb the future
    out2 = run(ids2)
    np.testing.assert_allclose(
        np.asarray(out1[:, :cut]), np.asarray(out2[:, :cut]), rtol=2e-4, atol=2e-5
    )
    # and the future did change (sanity)
    assert not np.allclose(np.asarray(out1[:, cut:]), np.asarray(out2[:, cut:]))


def test_hstu_timestamp_bias_affects_output():
    cfg, model = _make("HSTU")
    B, N = 2, cfg.total_seq_len
    rng = jax.random.PRNGKey(1)
    params = _init(model, cfg, B, rng)
    ids = jax.random.randint(rng, (B, N), 1, 51)
    lengths = jnp.full((B,), N, jnp.int32)
    ts1 = jnp.cumsum(jnp.full((B, N), 60, jnp.int32), axis=1)
    ts2 = jnp.cumsum(jnp.full((B, N), 86400 * 30, jnp.int32), axis=1)

    @jax.jit
    def run(ts):
        emb = model.apply(params, ids, method=SequentialRecommender.get_item_embeddings)
        return model.apply(params, lengths, ids, emb, {"timestamps": ts}, True)

    assert not np.allclose(np.asarray(run(ts1)), np.asarray(run(ts2)))


def test_get_current_embeddings():
    enc = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    lengths = jnp.array([1, 4])
    out = get_current_embeddings(lengths, enc)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(enc[0, 0]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(enc[1, 3]))


def test_embedding_padding_idx():
    cfg, model = _make("HSTU")
    params = _init(model, cfg, 2, jax.random.PRNGKey(0))
    emb = model.apply(
        params, jnp.array([[0, 1, 2]]), method=SequentialRecommender.get_item_embeddings
    )
    np.testing.assert_allclose(np.asarray(emb[0, 0]), 0.0)
    assert np.abs(np.asarray(emb[0, 1])).sum() > 0
