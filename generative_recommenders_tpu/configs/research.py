"""Frozen research experiment presets.

TPU twin of the reference's frozen gin files (`configs/{ml-1m,ml-20m,
amzn-books,ml-3b}/*-final.gin`, headers "Frozen config, validated on
04/11-12/2024") — the exact hyperparameters behind the README metric tables
(BASELINE.md). Each preset is a complete `TrainConfig`.
"""

from __future__ import annotations

from typing import Dict, Tuple

from generative_recommenders_tpu.models.sequential import ModelConfig
from generative_recommenders_tpu.train.train_loop import TrainConfig

_DATASET_NUM_ITEMS = {
    # expected_max_item_id from `research/data/preprocessor.py:433-480`
    "ml-1m": 3952,
    "ml-20m": 131262,
    "amzn-books": 695762,
    "ml-3b": 26743 * 32,
}


def _mk(
    dataset: str,
    main_module: str,
    *,
    seq_len: int,
    dim: int,
    blocks: int,
    heads: int,
    dqk: int = 0,
    dv: int = 0,
    ffn_hidden: int = 0,
    negatives: int = 128,
    batch: int = 128,
    epochs: int = 101,
    # "auto" = measured dispatch thresholds (models/hstu.py): XLA below
    # N=512 (256 on the bias path), Pallas above — a no-op for the frozen
    # short-N presets, and the in-kernel rel-bias path for long-N ones
    attn_kernel: str = "auto",
) -> TrainConfig:
    return TrainConfig(
        model=ModelConfig(
            main_module=main_module,
            num_items=_DATASET_NUM_ITEMS[dataset],
            max_sequence_len=seq_len,
            gr_output_length=10,
            item_embedding_dim=dim,
            num_blocks=blocks,
            num_heads=heads,
            dqk=dqk or dim,
            dv=dv or dim,
            linear_dropout_rate=0.2,
            dropout_rate=0.2,
            user_embedding_norm="l2_norm",
            ffn_hidden_dim=ffn_hidden or dim,
            ffn_activation_fn="relu",
            attn_kernel=attn_kernel,
        ),
        local_batch_size=batch,
        eval_batch_size=batch,
        num_epochs=epochs,
        learning_rate=1e-3,
        weight_decay=0.0,
        num_warmup_steps=0,
        sampling_strategy="local",
        loss_module="SampledSoftmaxLoss",
        num_negatives=negatives,
        temperature=0.05,
        item_l2_norm=True,
        l2_norm_eps=1e-6,
    )


RESEARCH_PRESETS: Dict[str, TrainConfig] = {
    # ml-1m (`configs/ml-1m/*-final.gin`)
    "ml-1m/sasrec-sampled-softmax-n128": _mk(
        "ml-1m", "SASRec", seq_len=200, dim=50, blocks=2, heads=1,
        ffn_hidden=50,
    ),
    "ml-1m/hstu-sampled-softmax-n128": _mk(
        "ml-1m", "HSTU", seq_len=200, dim=50, blocks=2, heads=1,
        dqk=50, dv=50,
    ),
    "ml-1m/hstu-sampled-softmax-n128-large": _mk(
        "ml-1m", "HSTU", seq_len=200, dim=50, blocks=8, heads=2,
        dqk=25, dv=25,
    ),
    # ml-20m (`configs/ml-20m/*-final.gin`)
    "ml-20m/sasrec-sampled-softmax-n128": _mk(
        "ml-20m", "SASRec", seq_len=200, dim=256, blocks=4, heads=4,
        ffn_hidden=256,
    ),
    "ml-20m/hstu-sampled-softmax-n128": _mk(
        "ml-20m", "HSTU", seq_len=200, dim=256, blocks=8, heads=2,
        dqk=32, dv=32,
    ),
    "ml-20m/hstu-sampled-softmax-n128-large": _mk(  # ← north-star target
        "ml-20m", "HSTU", seq_len=200, dim=256, blocks=16, heads=8,
        dqk=32, dv=32,
    ),
    # amzn-books (`configs/amzn-books/*-final.gin`)
    "amzn-books/sasrec-sampled-softmax-n512": _mk(
        "amzn-books", "SASRec", seq_len=50, dim=64, blocks=4, heads=4,
        ffn_hidden=64, negatives=512, epochs=201,
    ),
    "amzn-books/hstu-sampled-softmax-n512": _mk(
        "amzn-books", "HSTU", seq_len=50, dim=64, blocks=4, heads=4,
        dqk=16, dv=16, negatives=512, epochs=201,
    ),
    "amzn-books/hstu-sampled-softmax-n512-large": _mk(
        "amzn-books", "HSTU", seq_len=50, dim=64, blocks=16, heads=8,
        dqk=8, dv=8, negatives=512, epochs=201,
    ),
    # ml-3b (`configs/ml-3b/*-final.gin`)
    # attn_kernel="auto": at N=511 the bias path rides the in-kernel
    # rel-bias Pallas kernel (1.90x over the materializing XLA fallback at
    # N=512/B=32, benchmarks/tpu_r5_results/relbias_512.log)
    "ml-3b/hstu-sampled-softmax-n96-seqlen500-large": _mk(
        "ml-3b", "HSTU", seq_len=500, dim=256, blocks=16, heads=8,
        dqk=32, dv=32, negatives=128, batch=96, epochs=100,
        attn_kernel="auto",
    ),
}
