"""MoL (RAILS) tests: decoupled-inference consistency, loss-path training,
MoL eval path — mirrors the reference's strategy of exercising MoL through
the gin-wired research trainer (it has no dedicated unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_recommenders_tpu.data.dataset import (
    SequenceDataset,
    batch_iterator,
    synthetic_user_sequences,
)
from generative_recommenders_tpu.models.rails.mol import (
    MoLConfig,
    MoLSimilarity,
    load_balancing_mi_loss,
)
from generative_recommenders_tpu.models.sequential import (
    ModelConfig,
    SequentialRecommender,
)
from generative_recommenders_tpu.train.train_loop import (
    ResearchTrainer,
    TrainConfig,
)


def _mol_cfg(**kw):
    base = dict(
        query_embedding_dim=16,
        item_embedding_dim=16,
        dot_product_dimension=8,
        query_dot_product_groups=4,
        item_dot_product_groups=2,
        query_hidden_dim=32,
        item_hidden_dim=32,
        gating_query_hidden_dim=32,
        gating_item_hidden_dim=32,
        gating_qi_hidden_dim=32,
    )
    base.update(kw)
    return MoLConfig(**base)


def test_mol_decoupled_matches_joint():
    """__call__ must equal item_components + score_components (the MoL
    brute-force top-k decoupled path, `mol_top_k.py:35-133`)."""
    cfg = _mol_cfg()
    mol = MoLSimilarity(cfg)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((1, 13, 16)), jnp.float32)
    params = mol.init(jax.random.PRNGKey(0), q, items)
    joint, _ = mol.apply(params, q, items)

    i_comp = mol.apply(params, items, method=MoLSimilarity.item_components)
    gi = mol.apply(params, items, method=MoLSimilarity.gating_item_partial)
    q_comp, _ = mol.apply(
        params, q, None, True, method=MoLSimilarity.query_components
    )
    dec, _ = mol.apply(
        params, q, q_comp, i_comp, gi, True,
        method=MoLSimilarity.score_components,
    )
    np.testing.assert_allclose(np.asarray(joint), np.asarray(dec), rtol=1e-5)


def test_mi_loss_zero_for_uniform_gates():
    prs = jnp.full((4, 7, 8), 1.0 / 8)
    assert abs(float(load_balancing_mi_loss(prs))) < 1e-5
    # concentrated per-example gates with balanced utilization -> negative
    eye = jnp.eye(8)[jnp.arange(28) % 8].reshape(4, 7, 8)
    assert float(load_balancing_mi_loss(eye)) < -1.0


def test_mol_research_training_and_eval():
    seqs = synthetic_user_sequences(num_users=48, num_items=40, max_len=12, seed=0)
    ds = SequenceDataset(seqs, max_sequence_length=12, ignore_last_n=1)
    cfg = TrainConfig(
        model=ModelConfig(
            num_items=40,
            max_sequence_len=12,
            gr_output_length=1,
            item_embedding_dim=16,
            num_blocks=1,
            num_heads=2,
            dqk=8,
            dv=8,
            attn_kernel="xla",
            interaction_module_type="MoL",
            mol_config=_mol_cfg(temperature=0.2),
        ),
        local_batch_size=16,
        eval_batch_size=16,
        num_negatives=8,
        temperature=1.0,
        loss_weights=(("mi_loss", 0.001),),
        eval_item_chunk_size=16,
    )
    trainer = ResearchTrainer(cfg, ds.all_item_ids())
    rng = jax.random.PRNGKey(0)
    params = trainer.init_params(rng)
    opt_state = trainer.init_opt_state(params)
    losses = []
    for i, batch in enumerate(
        batch_iterator(ds, 16, shuffle=True, seed=0)
    ):
        params, opt_state, loss = trainer.train_step(
            params, opt_state, batch, jax.random.fold_in(rng, i)
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    metrics = trainer.eval_epoch(
        params, batch_iterator(ds, 16, shuffle=False, seed=0), max_iters=2
    )
    assert 0.0 <= metrics["hr@10"] <= 1.0
    assert metrics["mrr"] > 0.0
