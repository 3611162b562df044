"""Distributed-layer tests on the 8-virtual-device CPU mesh (conftest.py).

Mirrors the reference's strategy of exercising the real distributed path on
local devices (SURVEY.md §4 "multi-node strategy") — here with a fake mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_recommenders_tpu.data.dataset import (
    SequenceDataset,
    batch_iterator,
    synthetic_user_sequences,
)
from generative_recommenders_tpu.models.sequential import ModelConfig
from generative_recommenders_tpu.parallel import (
    DistributedTrainer,
    create_sharded_embedding,
    make_mesh,
    rowwise_adagrad_update,
    sharded_lookup,
)
from generative_recommenders_tpu.train.train_loop import TrainConfig


@pytest.fixture(scope="module")
def mesh():
    # Use the 8-virtual-device CPU backend (conftest.py) regardless of
    # whatever real accelerator is the default.
    return make_mesh(shape=(4, 2), devices=jax.devices("cpu"))


def test_sharded_lookup_matches_take(mesh):
    rng = jax.random.PRNGKey(0)
    state = create_sharded_embedding(rng, num_rows=64, dim=16, mesh=mesh)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 5), 0, 64)
    got = sharded_lookup(state.table, ids, mesh)
    want = jnp.take(state.table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_sharded_lookup_grad_is_scatter_add(mesh):
    rng = jax.random.PRNGKey(0)
    state = create_sharded_embedding(rng, num_rows=32, dim=8, mesh=mesh)
    ids = jnp.array([[1, 1, 5, 31, 0], [2, 2, 2, 7, 31]], jnp.int32)
    # ids must be data-shardable over 4 → pad batch to 4 rows
    ids = jnp.concatenate([ids, ids], axis=0)

    def f(table):
        out = sharded_lookup(table, ids, mesh)
        return jnp.sum(out * out)

    g = jax.grad(f)(state.table)
    # dense reference
    def f_ref(table):
        return jnp.sum(jnp.take(table, ids, axis=0) ** 2)

    g_ref = jax.grad(f_ref)(state.table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5)


def test_rowwise_adagrad_matches_dense_rule(mesh):
    rng = jax.random.PRNGKey(0)
    num_rows, D = 32, 8
    state = create_sharded_embedding(rng, num_rows=num_rows, dim=D, mesh=mesh)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 6), 0, num_rows)
    grads = jax.random.normal(jax.random.PRNGKey(2), (4, 6, D))
    lr = 0.1
    new = rowwise_adagrad_update(state, ids, grads, mesh, lr=lr)

    # dense reference of torchrec RowWiseAdagrad
    g_tab = np.zeros((num_rows, D), np.float32)
    np.add.at(g_tab, np.asarray(ids).reshape(-1), np.asarray(grads).reshape(-1, D))
    acc = np.asarray(state.accumulator) + (g_tab**2).mean(axis=1)
    want = np.asarray(state.table) - (lr / (np.sqrt(acc) + 1e-8))[:, None] * g_tab
    np.testing.assert_allclose(np.asarray(new.table), want, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(new.accumulator), acc, rtol=1e-5)


def test_distributed_trainer_step_and_eval(mesh):
    seqs = synthetic_user_sequences(
        num_users=64, num_items=40, max_len=12, seed=0
    )
    ds = SequenceDataset(seqs, max_sequence_length=12, ignore_last_n=1)
    cfg = TrainConfig(
        model=ModelConfig(
            num_items=40,
            max_sequence_len=12,
            gr_output_length=1,
            item_embedding_dim=16,
            num_blocks=2,
            num_heads=2,
            dqk=8,
            dv=8,
            attn_kernel="xla",
        ),
        local_batch_size=16,
        eval_batch_size=16,
        num_negatives=8,
    )
    trainer = DistributedTrainer(cfg, ds.all_item_ids(), mesh)
    rng = jax.random.PRNGKey(0)
    params, opt_state = trainer.init_sharded(rng)
    batch = next(batch_iterator(ds, 16, shuffle=False, seed=0))
    p2, o2, loss = trainer.train_step(params, opt_state, batch, rng)
    assert np.isfinite(float(loss))
    item_embs = trainer._item_embs(p2)
    ranks, _ = trainer.encode_step(p2, batch, item_embs)
    assert ranks.shape == (16,)
