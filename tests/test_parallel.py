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
    # ids must be shardable over the full 8-device mesh → 8 batch rows
    ids = jnp.concatenate([ids, ids, ids, ids], axis=0)

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
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 6), 0, num_rows)
    grads = jax.random.normal(jax.random.PRNGKey(2), (8, 6, D))
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


# ---------------------------------------------------------------------------
# all-to-all embedding exchange (round-2 engine, parallel/embedding.py)


def test_sharded_lookup_uneven_ownership(mesh):
    """Skewed owner distribution (all ids on one shard) must route exactly."""
    rng = jax.random.PRNGKey(3)
    state = create_sharded_embedding(rng, num_rows=64, dim=16, mesh=mesh)
    # every id owned by shard 1 (rows 32..63 on a 2-way model axis)
    ids = jax.random.randint(jax.random.PRNGKey(4), (8, 7), 32, 64)
    got = sharded_lookup(state.table, ids, mesh)
    want = jnp.take(state.table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_sharded_lookup_1d_ids(mesh):
    rng = jax.random.PRNGKey(5)
    state = create_sharded_embedding(rng, num_rows=16, dim=4, mesh=mesh)
    ids = jax.random.randint(jax.random.PRNGKey(6), (8,), 0, 16)
    got = sharded_lookup(state.table, ids, mesh)
    want = jnp.take(state.table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def _tiny_dlrm_trainer(mesh, n_layers=1):
    from generative_recommenders_tpu.configs.dlrm import (
        get_embedding_table_config,
        get_hstu_configs,
    )
    from generative_recommenders_tpu.train.dlrm_train import (
        DlrmTrainConfig,
        DlrmTrainer,
    )

    hstu_cfg = get_hstu_configs("debug", max_uih_len=16, max_num_candidates=3)
    hstu_cfg = type(hstu_cfg)(
        **{
            **hstu_cfg.__dict__,
            "hstu_attn_num_layers": n_layers,
            "hstu_embedding_table_dim": 16,
            "hstu_transducer_embedding_dim": 32,
            "hstu_attn_linear_dim": 16,
            "hstu_attn_qk_dim": 16,
            "hstu_num_heads": 2,
            "hstu_input_dropout_ratio": 0.0,
            "hstu_linear_dropout_rate": 0.0,
            "contextual_feature_to_min_uih_length": (),
        }
    )
    hash_size = 128
    tables = get_embedding_table_config("debug", hash_size=hash_size, dim=16)
    return (
        DlrmTrainer(
            hstu_cfg, tables, DlrmTrainConfig(batch_size=8), mesh=mesh
        ),
        hstu_cfg,
        hash_size,
    )


def test_dlrm_train_step_mesh_parity():
    """Sharded-embedding train step (model axis 2) ≡ pure-DP step (model
    axis 1): the all-to-all lookup + routed gradient + sharded row-wise
    Adagrad reproduce the single-shard math exactly (VERDICT round-1 #1)."""
    from generative_recommenders_tpu.data.dlrm_dataset import (
        DLRMv3RandomDataset,
    )
    from generative_recommenders_tpu.train.dlrm_train import _to_device

    cpus = jax.devices("cpu")
    losses = []
    params_out = []
    for shape in ((8, 1), (4, 2)):
        mesh = make_mesh(shape=shape, devices=cpus)
        trainer, hstu_cfg, hash_size = _tiny_dlrm_trainer(mesh)
        ds = DLRMv3RandomDataset(
            hstu_cfg, hash_size=hash_size, batch_size=8, seed=0
        )
        batch = _to_device(ds.batch())
        params, opt = trainer.init_sharded(jax.random.PRNGKey(1), batch)
        for step in range(2):
            params, opt, loss, *_ = trainer.train_step(
                params, opt, batch, jax.random.PRNGKey(7)
            )
        losses.append(float(loss))
        params_out.append(jax.device_get(params))
    assert np.allclose(losses[0], losses[1], rtol=1e-5), losses
    flat0 = jax.tree_util.tree_leaves(params_out[0])
    flat1 = jax.tree_util.tree_leaves(params_out[1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=1e-6)


def test_dlrm_train_step_no_table_allgather():
    """The compiled sharded train step must not all-gather the embedding
    table: comms are the id/vector exchange, not table replication."""
    from generative_recommenders_tpu.data.dlrm_dataset import (
        DLRMv3RandomDataset,
    )
    from generative_recommenders_tpu.train.dlrm_train import _to_device

    cpus = jax.devices("cpu")
    mesh = make_mesh(shape=(2, 4), devices=cpus)
    trainer, hstu_cfg, hash_size = _tiny_dlrm_trainer(mesh)
    ds = DLRMv3RandomDataset(
        hstu_cfg, hash_size=hash_size, batch_size=8, seed=0
    )
    batch = _to_device(ds.batch())
    params, opt = trainer.init_sharded(jax.random.PRNGKey(1), batch)
    # build + compile the step once, then inspect its optimized HLO
    trainer.train_step(params, opt, batch, jax.random.PRNGKey(2))
    compiled = trainer._train_step.lower(
        params, opt, batch, jax.random.PRNGKey(2)
    ).compile()
    hlo = compiled.as_text()
    table_rows = hash_size  # sharded table: 32 rows/shard, 16 cols
    for line in hlo.splitlines():
        if "all-gather" in line and f"{table_rows},16" in line.replace(" ", ""):
            raise AssertionError(f"table all-gather found: {line.strip()}")


def test_ragged_exchange_traces(mesh):
    """The TPU ragged_all_to_all variant can't execute on XLA:CPU (no
    thunk), but abstract evaluation validates all its shape/offset routing
    math — fwd and bwd."""
    import generative_recommenders_tpu.parallel.embedding as emb

    fn = emb._make_lookup(mesh, "ragged", 64, 16)
    table = jax.ShapeDtypeStruct((64, 16), jnp.float32)
    ids = jax.ShapeDtypeStruct((8, 5), jnp.int32)
    out = jax.eval_shape(fn, table, ids)
    assert out.shape == (8, 5, 16)

    def loss(t, i):
        return jnp.sum(fn(t, i) ** 2)

    g = jax.eval_shape(lambda t, i: jax.grad(loss)(t, i), table, ids)
    assert g.shape == (64, 16)


# ---------------------------------------------------------------------------
# research-stack sharded-table guarantees (VERDICT round-2 #4): the research
# trainer must ride the same all-to-all exchange as DlrmTrainer when the mesh
# row-shards the item table — no implicit GSPMD table all-gather.


def _tiny_research_cfg(num_items=127, batch=8):
    return TrainConfig(
        model=ModelConfig(
            num_items=num_items,  # +1 pad row = 128 — divisible by any axis
            max_sequence_len=12,
            gr_output_length=1,
            item_embedding_dim=16,
            num_blocks=1,
            num_heads=2,
            dqk=8,
            dv=8,
            attn_kernel="xla",
            linear_dropout_rate=0.0,
            dropout_rate=0.0,
        ),
        local_batch_size=batch,
        eval_batch_size=batch,
        num_negatives=8,
        sampling_strategy="local",
    )


def test_research_train_step_mesh_parity():
    """Research sharded-table step on (4,2) ≡ pure-DP step on (8,1): the
    all-to-all lookup + routed cotangents reproduce single-shard AdamW math."""
    cpus = jax.devices("cpu")
    seqs = synthetic_user_sequences(
        num_users=64, num_items=127, max_len=12, seed=0
    )
    ds = SequenceDataset(seqs, max_sequence_length=12, ignore_last_n=1)
    losses, tables = [], []
    for shape in ((8, 1), (4, 2)):
        mesh = make_mesh(shape=shape, devices=cpus)
        trainer = DistributedTrainer(_tiny_research_cfg(), ds.all_item_ids(), mesh)
        rng = jax.random.PRNGKey(0)
        params, opt_state = trainer.init_sharded(rng)
        batch = next(batch_iterator(ds, 8, shuffle=False, seed=0))
        for step in range(2):
            params, opt_state, loss = trainer.train_step(
                params, opt_state, batch, jax.random.PRNGKey(7 + step)
            )
        losses.append(float(loss))
        tables.append(
            np.asarray(params["params"]["embedding_module"]["item_emb"])
        )
    assert np.allclose(losses[0], losses[1], rtol=1e-5), losses
    np.testing.assert_allclose(tables[0], tables[1], rtol=5e-5, atol=1e-6)


def test_research_train_step_no_table_allgather():
    """The compiled research train step must not all-gather the 128x16 item
    table (or its AdamW moments): comms are the id/vector exchange only.
    Twin of test_dlrm_train_step_no_table_allgather."""
    cpus = jax.devices("cpu")
    mesh = make_mesh(shape=(2, 4), devices=cpus)
    seqs = synthetic_user_sequences(
        num_users=64, num_items=127, max_len=12, seed=0
    )
    ds = SequenceDataset(seqs, max_sequence_length=12, ignore_last_n=1)
    trainer = DistributedTrainer(_tiny_research_cfg(), ds.all_item_ids(), mesh)
    rng = jax.random.PRNGKey(0)
    params, opt_state = trainer.init_sharded(rng)
    batch = next(batch_iterator(ds, 8, shuffle=False, seed=0))
    trainer.train_step(params, opt_state, batch, rng)  # builds + compiles
    hlo = (
        trainer._sharded_train_step.lower(params, opt_state, batch, rng)
        .compile()
        .as_text()
    )
    for line in hlo.splitlines():
        if "all-gather" in line and "128,16" in line.replace(" ", ""):
            raise AssertionError(f"table all-gather found: {line.strip()}")
