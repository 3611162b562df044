"""DlrmHSTU end-to-end smoke tests (the reference's
`dlrm_v3/train/tests/train_test.py` pattern: run the real model on random
debug data, assert finite losses and valid shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_recommenders_tpu.configs.dlrm import (
    get_embedding_table_config,
    get_hstu_configs,
)
from generative_recommenders_tpu.data.dlrm_dataset import DLRMv3RandomDataset
from generative_recommenders_tpu.modules.dlrm_hstu import DlrmHSTU


def _tiny_cfg():
    cfg = get_hstu_configs("debug", max_uih_len=32, max_num_candidates=4)
    return cfg.__class__(
        **{
            **cfg.__dict__,
            "hstu_attn_num_layers": 2,
            "hstu_embedding_table_dim": 32,
            "hstu_transducer_embedding_dim": 48,
            "hstu_attn_linear_dim": 16,
            "hstu_attn_qk_dim": 16,
            "hstu_num_heads": 2,
            "contextual_feature_to_min_uih_length": (
                ("viewer_id", 8),
                ("dummy_contexual", 8),
            ),
        }
    )


def test_dlrm_hstu_forward_and_grads():
    cfg = _tiny_cfg()
    tables = get_embedding_table_config("debug", hash_size=100, dim=32)
    model = DlrmHSTU(cfg, tables)
    ds = DLRMv3RandomDataset(cfg, hash_size=100, batch_size=4, seed=0)
    uih, uih_lengths, cands, num_cands = ds.batch()
    uih = {k: jnp.asarray(v) for k, v in uih.items()}
    cands = {k: jnp.asarray(v) for k, v in cands.items()}
    uih_lengths = jnp.asarray(uih_lengths)
    num_cands = jnp.asarray(num_cands)

    params = model.init(
        jax.random.PRNGKey(0), uih, uih_lengths, cands, num_cands, True
    )

    def loss_fn(p):
        _, _, aux_losses, preds, labels, weights = model.apply(
            p, uih, uih_lengths, cands, num_cands, True
        )
        return sum(aux_losses.values()), (aux_losses, preds)

    (loss, (aux, preds)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )
    assert np.isfinite(float(loss))
    assert preds.shape == (len(cfg.multitask_configs), 4, cfg.max_num_candidates)
    # classification preds are probabilities
    assert float(jnp.min(preds)) >= 0.0 and float(jnp.max(preds)) <= 1.0
    # gradients flow into the embedding tables
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda g: jnp.sum(jnp.abs(g)), grads)
    )
    assert all(np.isfinite(float(x)) for x in flat)
    table_grad = grads["params"]["embedding_tables_post_id"]
    assert float(jnp.sum(jnp.abs(table_grad))) > 0.0


def test_dlrm_hstu_train_step_reduces_loss():
    import optax

    cfg = _tiny_cfg()
    tables = get_embedding_table_config("debug", hash_size=100, dim=32)
    model = DlrmHSTU(cfg, tables)
    ds = DLRMv3RandomDataset(cfg, hash_size=100, batch_size=8, seed=1)
    batch = ds.batch()
    uih, uih_lengths, cands, num_cands = (
        {k: jnp.asarray(v) for k, v in batch[0].items()},
        jnp.asarray(batch[1]),
        {k: jnp.asarray(v) for k, v in batch[2].items()},
        jnp.asarray(batch[3]),
    )
    params = model.init(
        jax.random.PRNGKey(0), uih, uih_lengths, cands, num_cands, True
    )
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            _, _, aux, *_ = model.apply(
                p, uih, uih_lengths, cands, num_cands, True
            )
            return sum(aux.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
