"""E2E smoke: the full research train/eval loop learns on synthetic data
(analogue of the reference's `dlrm_v3/train/tests/train_test.py` which runs
the real training main on a debug dataset)."""

import numpy as np

from generative_recommenders_tpu.data.dataset import (
    SequenceDataset,
    synthetic_user_sequences,
)
from generative_recommenders_tpu.models.sequential import ModelConfig
from generative_recommenders_tpu.train.train_loop import TrainConfig, train_loop


def test_train_loop_learns():
    seqs = synthetic_user_sequences(num_users=300, num_items=300, max_len=24, min_len=6, seed=0)
    train_ds = SequenceDataset(seqs, max_sequence_length=24, ignore_last_n=1)
    eval_ds = SequenceDataset(seqs, max_sequence_length=24, ignore_last_n=0)
    mcfg = ModelConfig(
        main_module="HSTU", num_items=300, max_sequence_len=24, gr_output_length=2,
        item_embedding_dim=32, num_blocks=2, num_heads=2, dqk=16, dv=16,
    )
    cfg = TrainConfig(
        model=mcfg, local_batch_size=64, eval_batch_size=64, num_epochs=20,
        learning_rate=2e-3, num_negatives=32, temperature=0.05,
        sampling_strategy="local", item_l2_norm=True,
        full_eval_every_n=19,  # partial evals in between
        partial_eval_num_iters=2,
    )
    out = train_loop(cfg, train_ds, eval_ds, log_every=1000)
    history = out["history"]
    first, last = history[0], history[-1]
    # must improve over training and beat random (hr@50 random = 50/300)
    assert last["hr@50"] > first["hr@50"]
    assert last["hr@50"] > 50.0 / 300.0
    assert np.isfinite(last["mrr"])


def test_train_loop_in_batch_sampling():
    seqs = synthetic_user_sequences(num_users=120, num_items=200, max_len=16, min_len=6, seed=1)
    train_ds = SequenceDataset(seqs, max_sequence_length=16, ignore_last_n=1)
    eval_ds = SequenceDataset(seqs, max_sequence_length=16, ignore_last_n=0)
    mcfg = ModelConfig(
        main_module="HSTU", num_items=200, max_sequence_len=16, gr_output_length=2,
        item_embedding_dim=16, num_blocks=1, num_heads=1, dqk=8, dv=8,
    )
    cfg = TrainConfig(
        model=mcfg, local_batch_size=32, eval_batch_size=32, num_epochs=2,
        sampling_strategy="in-batch", num_negatives=16,
    )
    out = train_loop(cfg, train_ds, eval_ds, log_every=1000)
    assert np.isfinite(out["history"][-1]["mrr"])
