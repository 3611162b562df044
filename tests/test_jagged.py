"""Differential tests for the jagged-tensor library vs hand-built numpy.

Mirrors the reference's test strategy (jagged_tensors_test.py — eager op as
executable spec, randomized shapes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from generative_recommenders_tpu.ops import jagged as jg


def _random_jagged(rng, B, max_len, D):
    lengths = rng.integers(0, max_len + 1, size=(B,))
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    total = int(offsets[-1])
    vals = rng.standard_normal((total, D)).astype(np.float32)
    return lengths.astype(np.int32), offsets, vals


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("B,max_len,D", [(4, 7, 3), (1, 1, 1), (8, 16, 5)])
def test_jagged_dense_roundtrip(seed, B, max_len, D):
    rng = np.random.default_rng(seed)
    lengths, offsets, vals = _random_jagged(rng, B, max_len, D)
    cap = B * max_len
    vals_padded = np.zeros((cap, D), np.float32)
    vals_padded[: vals.shape[0]] = vals

    dense = jg.jagged_to_padded_dense(jnp.array(vals_padded), jnp.array(offsets), max_len)
    # numpy spec
    expected = np.zeros((B, max_len, D), np.float32)
    for b in range(B):
        n = lengths[b]
        expected[b, :n] = vals[offsets[b] : offsets[b] + n]
    np.testing.assert_allclose(np.asarray(dense), expected, rtol=0, atol=0)

    back = jg.dense_to_jagged(dense, jnp.array(offsets), total=cap)
    np.testing.assert_allclose(np.asarray(back)[: vals.shape[0]], vals)
    # padding slots are zero
    np.testing.assert_allclose(np.asarray(back)[vals.shape[0] :], 0.0)


def test_lengths_offsets():
    lengths = jnp.array([3, 0, 2], jnp.int32)
    offs = jg.lengths_to_offsets(lengths)
    np.testing.assert_array_equal(np.asarray(offs), [0, 3, 3, 5])
    np.testing.assert_array_equal(np.asarray(jg.offsets_to_lengths(offs)), [3, 0, 2])


@pytest.mark.parametrize("seed", [0, 3])
def test_concat_split_2d_jagged(seed):
    rng = np.random.default_rng(seed)
    B, D = 5, 4
    len_l, off_l, val_l = _random_jagged(rng, B, 6, D)
    len_r, off_r, val_r = _random_jagged(rng, B, 3, D)
    cap_l, cap_r = B * 6, B * 3
    vl = np.zeros((cap_l, D), np.float32)
    vl[: val_l.shape[0]] = val_l
    vr = np.zeros((cap_r, D), np.float32)
    vr[: val_r.shape[0]] = val_r

    out, out_off = jg.concat_2D_jagged(
        jnp.array(vl), jnp.array(off_l), jnp.array(vr), jnp.array(off_r)
    )
    # numpy spec
    rows = []
    for b in range(B):
        rows.append(val_l[off_l[b] : off_l[b + 1]])
        rows.append(val_r[off_r[b] : off_r[b + 1]])
    expected = np.concatenate(rows, axis=0)
    np.testing.assert_array_equal(
        np.asarray(out_off), np.concatenate([[0], np.cumsum(len_l + len_r)])
    )
    np.testing.assert_allclose(np.asarray(out)[: expected.shape[0]], expected)

    # split back
    got_l, got_r = jg.split_2D_jagged(
        out, out_off, jnp.array(off_l), jnp.array(off_r), cap_l, cap_r
    )
    np.testing.assert_allclose(np.asarray(got_l)[: val_l.shape[0]], val_l)
    np.testing.assert_allclose(np.asarray(got_r)[: val_r.shape[0]], val_r)


def test_concat_dense_first():
    rng = np.random.default_rng(0)
    B, P, D = 3, 2, 4
    dense = rng.standard_normal((B, P, D)).astype(np.float32)
    len_r, off_r, val_r = _random_jagged(rng, B, 4, D)
    vr = np.zeros((B * 4, D), np.float32)
    vr[: val_r.shape[0]] = val_r
    out, out_off = jg.concat_2D_jagged_dense_first(
        jnp.array(dense), jnp.array(vr), jnp.array(off_r)
    )
    rows = []
    for b in range(B):
        rows.append(dense[b])
        rows.append(val_r[off_r[b] : off_r[b + 1]])
    expected = np.concatenate(rows, axis=0)
    np.testing.assert_allclose(np.asarray(out)[: expected.shape[0]], expected, rtol=1e-6)


def test_jagged_dense_bmm_broadcast_add():
    rng = np.random.default_rng(1)
    B, N, D, K = 4, 5, 3, 6
    lengths, offsets, vals = _random_jagged(rng, B, N, D)
    cap = B * N
    v = np.zeros((cap, D), np.float32)
    v[: vals.shape[0]] = vals
    w = rng.standard_normal((B, D, K)).astype(np.float32)
    bias = rng.standard_normal((B, K)).astype(np.float32)
    out = jg.jagged_dense_bmm_broadcast_add(
        jnp.array(v), jnp.array(offsets), jnp.array(w), jnp.array(bias), max_len=N
    )
    expected = np.zeros((cap, K), np.float32)
    for b in range(B):
        for i in range(offsets[b], offsets[b + 1]):
            expected[i] = vals[i] @ w[b] + bias[b]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_jagged_reduce_sum():
    rng = np.random.default_rng(2)
    B, N, D = 3, 4, 2
    lengths, offsets, vals = _random_jagged(rng, B, N, D)
    v = np.zeros((B * N, D), np.float32)
    v[: vals.shape[0]] = vals
    # garbage in padding must be ignored
    v[vals.shape[0] :] = 99.0
    out = jg.jagged_reduce_sum(jnp.array(v), jnp.array(offsets))
    expected = np.stack(
        [vals[offsets[b] : offsets[b + 1]].sum(0) for b in range(B)]
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6, atol=1e-6)
