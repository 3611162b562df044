"""Training-dynamics parity: in-kernel rel-bias Pallas vs materializing XLA.

The rel-bias Pallas kernel is differential-tested per-op (fwd + all five
gradients) on real TPU; this closes the remaining gap by running REAL
optimization end-to-end on both paths from identical initial params and
comparing the loss trajectories — gradient errors compound over steps, so
trajectory agreement is the training-dynamics bar. bf16 compute puts the
acceptance band at the numerics floor, not at exactness.

    python benchmarks/relbias_train_parity.py [--steps 30] [--seq_len 512]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from generative_recommenders_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from generative_recommenders_tpu.configs.research import RESEARCH_PRESETS
    from generative_recommenders_tpu.train.train_loop import ResearchTrainer

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_items", type=int, default=20000)
    args = p.parse_args()

    base = RESEARCH_PRESETS["ml-20m/hstu-sampled-softmax-n128-large"]
    base = dataclasses.replace(
        base,
        local_batch_size=args.batch_size,
        model=dataclasses.replace(
            base.model,
            max_sequence_len=args.seq_len,
            num_items=args.num_items,
            compute_dtype="bfloat16",
        ),
    )
    B, Nh = args.batch_size, args.seq_len
    rng = np.random.default_rng(0)
    lengths = np.clip(rng.integers(20, Nh, (B,)), 1, Nh).astype(np.int64)
    ids = rng.integers(1, args.num_items, (B, Nh)).astype(np.int64)
    ids = np.where(np.arange(Nh)[None, :] < lengths[:, None], ids, 0)
    ts = np.sort(rng.integers(1, 1 << 20, (B, Nh)), axis=1).astype(np.int64)
    batch = {
        "historical_ids": jnp.asarray(ids),
        "historical_ratings": jnp.asarray(np.ones_like(ids)),
        "historical_timestamps": jnp.asarray(ts),
        "history_lengths": jnp.asarray(lengths),
        "target_ids": jnp.asarray(rng.integers(1, args.num_items, (B,))),
        "target_ratings": jnp.asarray(np.ones((B,), np.int64)),
        "target_timestamps": jnp.asarray(ts.max(axis=1) + 1),
    }

    trajs = {}
    for kernel in ("xla", "pallas"):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, attn_kernel=kernel)
        )
        trainer = ResearchTrainer(cfg, np.arange(1, args.num_items + 1))
        params = trainer.init_params(jax.random.PRNGKey(0))
        opt_state = trainer.init_opt_state(params)
        losses = []
        rng_key = jax.random.PRNGKey(1)
        step = jax.jit(trainer._train_step_impl)
        for i in range(args.steps):
            params, opt_state, loss = step(
                params, opt_state, batch, jax.random.fold_in(rng_key, i)
            )
            losses.append(float(loss))
        trajs[kernel] = losses
        print(kernel, [round(x, 4) for x in losses[:: max(1, args.steps // 6)]],
              "final", round(losses[-1], 4), flush=True)

    a, b = np.asarray(trajs["xla"]), np.asarray(trajs["pallas"])
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-6)
    print(json.dumps({
        "steps": args.steps,
        "final_xla": round(float(a[-1]), 5),
        "final_pallas": round(float(b[-1]), 5),
        "max_rel_div": round(float(rel.max()), 5),
        "final_rel_div": round(float(rel[-1]), 5),
    }))


if __name__ == "__main__":
    main()
