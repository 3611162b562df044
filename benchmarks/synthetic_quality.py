"""End-to-end quality demonstration on the learnable synthetic corpus.

The real MovieLens/Amazon corpora need downloads this environment can't make,
so this is the quality smoke at meaningful scale: 8k users / 2k items with
latent-factor sequential structure; HSTU must beat the popularity floor by a
wide margin and improve monotonically. Prints one JSON line at the end.

    python benchmarks/synthetic_quality.py [--epochs 15]
"""

from __future__ import annotations

import argparse
import json
import logging
import time

import jax


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--num_users", type=int, default=8192)
    p.add_argument("--num_items", type=int, default=2000)
    p.add_argument("--max_len", type=int, default=64)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--attn_kernel", default=None)
    args = p.parse_args()

    from generative_recommenders_tpu.data.dataset import (
        SequenceDataset,
        synthetic_user_sequences,
    )
    from generative_recommenders_tpu.models.sequential import ModelConfig
    from generative_recommenders_tpu.train.train_loop import (
        TrainConfig,
        train_loop,
    )

    t0 = time.time()
    seqs = synthetic_user_sequences(
        num_users=args.num_users, num_items=args.num_items,
        max_len=args.max_len, min_len=8, seed=0,
    )
    print(f"generated corpus in {time.time()-t0:.1f}s", flush=True)
    train_ds = SequenceDataset(seqs, args.max_len, ignore_last_n=1)
    eval_ds = SequenceDataset(seqs, args.max_len, ignore_last_n=0)
    attn = args.attn_kernel or (
        "pallas" if jax.default_backend() == "tpu" else "xla"
    )
    cfg = TrainConfig(
        model=ModelConfig(
            num_items=args.num_items,
            max_sequence_len=args.max_len,
            gr_output_length=1,
            item_embedding_dim=64,
            num_blocks=4,
            num_heads=2,
            dqk=32,
            dv=32,
            attn_kernel=attn,
            enable_relative_attention_bias=(attn == "xla"),
            compute_dtype="bfloat16" if attn == "pallas" else "float32",
        ),
        local_batch_size=128,
        eval_batch_size=128,
        num_epochs=args.epochs,
        num_negatives=128,
        learning_rate=1e-3,
    )
    out = train_loop(cfg, train_ds, eval_ds, log_every=50)
    hist = out["history"]
    first, last = hist[0], hist[-1]
    print(
        json.dumps(
            {
                "metric": "synthetic_hr@10",
                "first_epoch": round(float(first["hr@10"]), 4),
                "final": round(float(last["hr@10"]), 4),
                "final_ndcg@10": round(float(last["ndcg@10"]), 4),
                "final_mrr": round(float(last["mrr"]), 4),
                "popularity_floor": round(10.0 / args.num_items, 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
