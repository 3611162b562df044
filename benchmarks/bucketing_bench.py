"""Seq-len bucketing step-time benchmark at mixed lengths (VERDICT round-1
missing #6 "Done = flagship step time at mixed lengths improves").

Simulates a realistic mixed-length workload at the flagship research shape:
70% of batches have short histories (max length <= short_len), 30% are
full-length. Measures wall-clock for the same batch schedule with bucketing
off (every batch padded to N=200) vs on (short batches compile/run at the
bucket width). Relay dispatch noise amortizes over the step count.

    python benchmarks/bucketing_bench.py [--steps 60]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--short_len", type=int, default=64)
    p.add_argument("--short_frac", type=float, default=0.7)
    args = p.parse_args()

    from generative_recommenders_tpu.configs.research import RESEARCH_PRESETS
    from generative_recommenders_tpu.data.dataset import (
        SequenceDataset,
        _build_batch,
        synthetic_user_sequences_vectorized,
    )
    from generative_recommenders_tpu.train.train_loop import ResearchTrainer
    import dataclasses

    base = RESEARCH_PRESETS["ml-20m/hstu-sampled-softmax-n128-large"]
    N = base.model.max_sequence_len
    seqs = synthetic_user_sequences_vectorized(
        num_users=8192, num_items=base.model.num_items, max_len=N,
        min_len=10, seed=0,
    )
    ds = SequenceDataset(seqs, N, ignore_last_n=1)

    # batch schedule: short batches draw only users with short histories
    rng = np.random.default_rng(0)
    hist_lens = np.asarray([min(len(x) - 1, N) for x in seqs.item_ids])
    short_users = np.where(hist_lens <= args.short_len)[0]
    long_users = np.arange(len(ds))
    schedule = []
    for i in range(args.steps):
        if rng.random() < args.short_frac and len(short_users) >= args.batch_size:
            idxs = rng.choice(short_users, args.batch_size, replace=False)
        else:
            idxs = rng.choice(long_users, args.batch_size, replace=False)
        schedule.append(_build_batch(ds, idxs))

    results = {}
    for mode, buckets in [("off", ()), ("on", (args.short_len, 128, N))]:
        cfg = dataclasses.replace(base, seq_len_buckets=buckets, num_workers=0)
        trainer = ResearchTrainer(cfg, ds.all_item_ids())
        r = jax.random.PRNGKey(0)
        params = trainer.init_params(r)
        opt = trainer.init_opt_state(params)
        # warm every bucket shape
        warm = {b["historical_ids"].shape for b in schedule}
        seen = set()
        for b in schedule:
            key = b["historical_ids"].shape + (int(b["history_lengths"].max()),)
            params, opt, _ = trainer.train_step(params, opt, b, r)
        jax.block_until_ready(params)
        t0 = time.perf_counter()
        for i, b in enumerate(schedule):
            params, opt, loss = trainer.train_step(
                params, opt, b, jax.random.fold_in(r, i)
            )
        jax.block_until_ready(params)
        float(jax.device_get(loss))
        dt = time.perf_counter() - t0
        results[mode] = dt / args.steps
        print(
            f"bucketing {mode:3s}: {dt/args.steps*1e3:7.1f} ms/step "
            f"({args.batch_size/ (dt/args.steps):7.0f} ex/s)",
            flush=True,
        )
    print(json.dumps({
        "metric": "bucketing_mixed_len_step_ms",
        "off": round(results["off"] * 1e3, 1),
        "on": round(results["on"] * 1e3, 1),
        "speedup": round(results["off"] / results["on"], 3),
    }))


if __name__ == "__main__":
    main()
