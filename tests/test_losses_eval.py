"""Differential tests for losses, samplers, and eval rank computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_recommenders_tpu.models.losses import sampled_softmax_loss
from generative_recommenders_tpu.models.samplers import InBatchNegativesSampler
from generative_recommenders_tpu.train.eval_metrics import (
    MAX_K,
    build_id_to_col,
    metrics_from_ranks,
    target_ranks,
)
from generative_recommenders_tpu.indexing.candidate_index import CandidateIndex


def test_sampled_softmax_matches_numpy():
    rng = np.random.default_rng(0)
    B, N, D, R = 3, 5, 8, 4
    out = rng.standard_normal((B, N, D)).astype(np.float32)
    sup = rng.standard_normal((B, N, D)).astype(np.float32)
    sup_ids = rng.integers(1, 20, size=(B, N))
    w = (rng.random((B, N)) < 0.7).astype(np.float32)
    neg_ids = rng.integers(1, 20, size=(B, N, R))
    neg = rng.standard_normal((B, N, R, D)).astype(np.float32)
    temp = 0.05

    got, _ = jax.jit(sampled_softmax_loss, static_argnames=("softmax_temperature",))(
        jnp.array(out), jnp.array(sup), jnp.array(sup_ids), jnp.array(w),
        jnp.array(neg_ids), jnp.array(neg), softmax_temperature=temp,
    )
    # numpy spec (jagged form flattened)
    tot, wsum = 0.0, 0.0
    for b in range(B):
        for n in range(N):
            pos_logit = out[b, n] @ sup[b, n] / temp
            negs = neg[b, n] @ out[b, n] / temp
            negs = np.where(sup_ids[b, n] == neg_ids[b, n], -5e4, negs)
            logits = np.concatenate([[pos_logit], negs])
            m = logits.max()
            lse = m + np.log(np.exp(logits - m).sum())
            tot += (lse - pos_logit) * w[b, n]
            wsum += w[b, n]
    np.testing.assert_allclose(float(got), tot / wsum, rtol=1e-5)


def test_in_batch_dedup_sampler():
    sampler = InBatchNegativesSampler(l2_norm=False, l2_norm_eps=1e-6, dedup_embeddings=True)
    ids = jnp.array([5, 3, 5, 0, 7, 3, 0, 9])
    presences = ids != 0
    emb = jnp.stack([jnp.full((4,), float(i)) for i in np.asarray(ids)])
    state = jax.jit(lambda i, p, e: sampler.process_batch(i, p, e))(
        ids, presences, emb
    )
    count = int(state.count)
    assert count == 4
    got_ids = sorted(np.asarray(state.ids[:count]).tolist())
    assert got_ids == [3, 5, 7, 9]
    # embeddings must correspond to ids
    for i in range(count):
        np.testing.assert_allclose(
            np.asarray(state.embeddings[i]), float(np.asarray(state.ids[i]))
        )
    # sampling stays within the unique set
    s_ids, s_emb = jax.jit(
        lambda r, s, p: sampler(r, s, p, num_to_sample=7)
    )(jax.random.PRNGKey(0), state, jnp.zeros((10,), jnp.int32))
    assert set(np.asarray(s_ids).ravel().tolist()) <= {3, 5, 7, 9}


def _np_rank(scores, tcol, seen_cols, k):
    """numpy spec: rank among unseen items, ties broken pessimistically none."""
    s = scores.copy()
    tscore = s[tcol]
    target_seen = tcol in seen_cols
    for c in seen_cols:
        s[c] = -np.inf
    rank = 1 + int((s > tscore).sum())
    if target_seen:
        return MAX_K + 1
    return rank if rank <= k else MAX_K + 1


def test_target_ranks_matches_numpy():
    rng = np.random.default_rng(3)
    B, D, X, N = 6, 8, 40, 10
    item_ids = np.sort(rng.choice(np.arange(1, 100), size=X, replace=False)).astype(np.int32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    ie = rng.standard_normal((X, D)).astype(np.float32)
    past = np.zeros((B, N), np.int32)
    targets = np.zeros((B,), np.int32)
    for b in range(B):
        n = rng.integers(1, N)
        past[b, :n] = rng.choice(item_ids, size=n)
        targets[b] = rng.choice(item_ids)
    # make one row's target seen
    past[0, 0] = targets[0]
    id_to_col = build_id_to_col(item_ids, 100)
    k = min(MAX_K, X)
    got = np.asarray(
        target_ranks(
            jnp.array(q), jnp.array(ie), jnp.array(id_to_col),
            jnp.array(targets), jnp.array(past), k=k,
        )
    )
    scores = q @ ie.T
    for b in range(B):
        seen = [id_to_col[i] for i in past[b] if i > 0]
        want = _np_rank(scores[b], id_to_col[targets[b]], seen, k)
        assert got[b] == want, (b, got[b], want)


def test_metrics_from_ranks():
    ranks = jnp.array([1, 11, 2501])
    m = metrics_from_ranks(ranks)
    np.testing.assert_allclose(np.asarray(m["hr@10"]), [1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(m["hr@50"]), [1.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(m["ndcg@1"]), [1.0, 0.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(m["mrr"]), [1.0, 1.0 / 11.0, 1.0 / 2501.0], rtol=1e-6
    )


def test_candidate_index_topk_filtering():
    rng = np.random.default_rng(5)
    X, D, B, k = 30, 6, 4, 5
    ids = jnp.arange(1, X + 1, dtype=jnp.int32)
    embs = jnp.array(rng.standard_normal((X, D)).astype(np.float32))
    idx = CandidateIndex(ids=ids, embeddings=embs)
    q = jnp.array(rng.standard_normal((B, D)).astype(np.float32))
    invalid = jnp.array(rng.integers(1, X + 1, size=(B, 3)).astype(np.int32))
    top_ids, top_scores = jax.jit(
        idx.get_top_k_outputs, static_argnames=("k",)
    )(q, k=k, invalid_ids=invalid)
    scores = np.asarray(q) @ np.asarray(embs).T
    for b in range(B):
        order = np.argsort(-scores[b], kind="stable")
        valid = [i + 1 for i in order if (i + 1) not in set(np.asarray(invalid[b]).tolist())]
        np.testing.assert_array_equal(np.asarray(top_ids[b]), valid[:k])
        # scores descending
        got_scores = np.asarray(top_scores[b])
        assert np.all(np.diff(got_scores) <= 1e-6)
