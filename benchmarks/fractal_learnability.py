"""Learnability check for the fractal-expansion rehearsal corpus.

The ML-3B rehearsal measures throughput; this checks the corpus itself
carries learnable sequential signal (the Kronecker expansion preserves the
base corpus's item co-occurrence inside each shuffled block): train a small
HSTU on `build/ml20mx4/2x2` and report the sampled-softmax loss trajectory
plus held-out full-corpus HR@10 (reference MAX_K protocol) against the
popularity-top-10 floor.

Usage: python benchmarks/fractal_learnability.py [--steps 400]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--prefix", default="build/ml20mx4/2x2")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--eval_users", type=int, default=512)
    p.add_argument("--sample_ratio", type=float, default=0.1)
    args = p.parse_args()

    from generative_recommenders_tpu.data.dataset import (
        MultiFileSequenceDataset,
        batch_iterator,
    )
    from generative_recommenders_tpu.models.sequential import ModelConfig
    from generative_recommenders_tpu.train.train_loop import (
        ResearchTrainer,
        TrainConfig,
    )

    ds = MultiFileSequenceDataset(
        args.prefix, max_sequence_length=args.seq_len, ignore_last_n=1,
        sample_ratio=args.sample_ratio,
    )
    # scan row maxima for the true id range (stride keeps it a few
    # seconds through the native reader); +1 margin for safety
    probe = [
        max(int(ds.get_row(i)["historical_ids"].max()),
            int(ds.get_row(i)["target_ids"]))
        for i in range(0, len(ds), 3)
    ]
    num_items = int(max(probe)) + 2
    cfg = TrainConfig(
        model=ModelConfig(
            num_items=num_items, max_sequence_len=args.seq_len,
            gr_output_length=1, item_embedding_dim=64, num_blocks=2,
            num_heads=2, dqk=32, dv=32, attn_kernel="xla",
        ),
        local_batch_size=args.batch_size,
        num_negatives=128,
        num_workers=0,
    )
    trainer = ResearchTrainer(cfg, np.arange(1, num_items + 1))
    rng = jax.random.PRNGKey(0)
    params = trainer.init_params(rng)
    opt_state = trainer.init_opt_state(params)

    losses = []
    it = batch_iterator(ds, args.batch_size, shuffle=True, seed=0)
    for step in range(args.steps):
        try:
            batch = next(it)
        except StopIteration:
            it = batch_iterator(ds, args.batch_size, shuffle=True, seed=step)
            batch = next(it)
        params, opt_state, loss = trainer.train_step(
            params, opt_state, batch, jax.random.fold_in(rng, step)
        )
        if step % 25 == 0 or step == args.steps - 1:
            losses.append((step, round(float(loss), 4)))
            print(f"step {step}: loss {float(loss):.4f}", flush=True)

    # held-out full-corpus eval (reference MAX_K protocol) on a user sample,
    # vs the popularity-top-10 floor (same null model as
    # benchmarks/parity_quality.py)
    eval_ds = MultiFileSequenceDataset(
        args.prefix, max_sequence_length=args.seq_len, ignore_last_n=0,
        sample_ratio=args.sample_ratio,
    )
    max_iters = max(1, args.eval_users // args.batch_size)
    metrics = trainer.eval_epoch(
        params,
        batch_iterator(eval_ds, args.batch_size, shuffle=True, seed=1),
        max_iters=max_iters,
    )
    pop = np.zeros(num_items, np.int64)
    targets = []
    step_stride = max(1, len(eval_ds) // 20000)
    for i in range(0, len(eval_ds), step_stride):
        row = eval_ds.get_row(i)
        ids = row["historical_ids"]
        L = int(row["history_lengths"])
        np.add.at(pop, np.clip(ids[: max(L - 1, 0)], 0, num_items - 1), 1)
        targets.append(int(row["target_ids"]))
    top10 = set(np.argsort(pop)[-10:].tolist())
    pop_hr10 = float(np.mean([t in top10 for t in targets]))
    out = {
        "loss_first": losses[0][1],
        "loss_last": losses[-1][1],
        "hr10_model": round(float(metrics.get("hr@10", 0.0)), 5),
        "hr10_popularity_floor": round(pop_hr10, 5),
        "eval_users": max_iters * args.batch_size,
        "num_items": num_items,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
