"""ML-3B single-chip rehearsal: the full host+device training pipeline.

Runs the research trainer at the frozen ml-3b preset shape
(`configs/ml-3b/hstu-sampled-softmax-n96-seqlen500-large-final.gin`: 16
blocks, 8 heads, d=256, N=500, B=96) over a fractal-expansion MultiFile
corpus (`benchmarks/gen_ml20m_scale.py` + `cli/run_fractal_expansion.py`,
the runnable stand-in for the real ML-3B shards in this zero-egress
environment) with the production pipeline engaged end-to-end: MultiFile +
native mmap CSV reader + threaded prefetch + seq-len compile bucketing +
stochastic length in the jitted hot path.

Reports three rates and their ratios (BASELINE.md scaling-target rehearsal):
  * host_ex_s    — prefetched iterator drained with no device work
                   (host-pipeline ceiling);
  * device_ex_s  — fixed-batch fori_loop of train steps at the full padded
                   width (device ceiling, differential-timed);
  * e2e_ex_s     — real loop: iterator -> bucketing/SL -> per-step dispatch,
                   timed via the loss data-dependency chain (the relay's
                   block_until_ready is asynchronous; reading the last loss
                   forces every chained step).

Usage:
  python benchmarks/ml3b_rehearsal.py --prefix build/ml20mx4/2x2 \
      [--steps 40] [--buckets 128,256,384,512] [--sl_alpha 1.6]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--prefix", default="build/ml20mx4/2x2")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--warmup", type=int, default=6)
    p.add_argument("--buckets", default="128,256,384,512")
    p.add_argument("--sl_alpha", type=float, default=1.6)
    p.add_argument("--batch_size", type=int, default=0, help="0 = preset (96)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--attn_kernel", default=None, choices=["xla", "pallas"])
    p.add_argument("--num_items", type=int, default=0, help="0 = corpus max+1")
    p.add_argument(
        "--num_blocks", type=int, default=0,
        help="0 = preset (16); smaller for CPU smoke runs only",
    )
    p.add_argument("--out", default="")
    args = p.parse_args()

    from generative_recommenders_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    import dataclasses

    from generative_recommenders_tpu.configs.research import RESEARCH_PRESETS
    from generative_recommenders_tpu.data.dataset import (
        MultiFileSequenceDataset,
        prefetched_batch_iterator,
    )
    from generative_recommenders_tpu.train.train_loop import ResearchTrainer

    cfg = RESEARCH_PRESETS["ml-3b/hstu-sampled-softmax-n96-seqlen500-large"]
    N = cfg.model.max_sequence_len
    ds = MultiFileSequenceDataset(
        args.prefix, max_sequence_length=N, ignore_last_n=1
    )
    # corpus item-id range (col-multiplier * base items); the preset's
    # 855k-item table stays as frozen — the corpus just occupies a prefix
    num_items = args.num_items
    if num_items == 0:
        probe = [
            int(ds.get_row(i)["historical_ids"].max()) for i in range(64)
        ]
        num_items = max(cfg.model.num_items, max(probe) + 1)
    overrides = dict(
        stochastic_length_alpha=args.sl_alpha,
        seq_len_buckets=tuple(
            int(x) for x in args.buckets.split(",") if x
        ),
        num_workers=args.num_workers,
        # rematerialize the sampled-softmax loss (the reference's
        # `losses/sampled_softmax.py:170-175` activation checkpointing):
        # at B=96/N=511/855k items the saved negative-embedding gather is
        # what pushed HBM 379 MB over capacity
        loss_activation_checkpoint=True,
        model=dataclasses.replace(
            cfg.model,
            num_items=num_items,
            # per-block activation recomputation: the f32 preset's 16 layers
            # of saved activations put B=96 ~3.8G over HBM even with the
            # loss checkpointed (the reference trains big models with the
            # same trade — STULayerConfig recompute_* flags)
            remat=True,
            attn_kernel=args.attn_kernel
            or ("pallas" if jax.default_backend() == "tpu" else "xla"),
            **(
                {"num_blocks": args.num_blocks} if args.num_blocks else {}
            ),
        ),
    )
    if args.batch_size:
        overrides["local_batch_size"] = args.batch_size
    cfg = dataclasses.replace(cfg, **overrides)
    B = cfg.local_batch_size
    native = ds._native is not None
    print(
        f"corpus: {len(ds)} rows, num_items={num_items}, native_reader={native}, "
        f"B={B} N={N} buckets={cfg.seq_len_buckets} sl_alpha={args.sl_alpha} "
        f"attn={cfg.model.attn_kernel}",
        flush=True,
    )

    # ---- host-pipeline ceiling: drain the prefetched iterator, no device
    it = prefetched_batch_iterator(
        ds, B, shuffle=True, seed=0, num_workers=cfg.num_workers,
        prefetch_factor=16,
    )
    for _ in range(2):
        next(it)  # spin up workers
    t0 = time.perf_counter()
    drained = 0
    for _ in range(args.steps):
        next(it)
        drained += 1
    host_dt = time.perf_counter() - t0
    host_ex_s = drained * B / host_dt
    print(f"host pipeline: {host_ex_s:,.0f} ex/s", flush=True)

    # ---- trainer
    trainer = ResearchTrainer(cfg, np.arange(1, num_items + 1))
    rng = jax.random.PRNGKey(0)
    params = trainer.init_params(rng)
    opt_state = trainer.init_opt_state(params)

    # ---- device ceiling: fori_loop at the full padded width (differential)
    fixed = next(it)

    def make(n):
        @jax.jit
        def f(params, opt_state, batch, rng):
            def body(i, c):
                pp, oo = c
                pp, oo, _ = trainer._train_step_impl(
                    pp, oo, batch, jax.random.fold_in(rng, i)
                )
                return (pp, oo)

            return jax.lax.fori_loop(0, n, body, (params, opt_state))

        return f

    jbatch = {k: jnp.asarray(v) for k, v in fixed.items()}

    def run(f):
        pp, _ = f(params, opt_state, jbatch, rng)
        return float(
            jnp.sum(jax.tree_util.tree_leaves(pp)[0][:1].astype(jnp.float32))
        )

    n_lo, n_hi = 3, 9
    f_lo, f_hi = make(n_lo), make(n_hi)
    run(f_lo)
    run(f_hi)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run(f_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(f_hi)
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    device_ex_s = B / best
    print(f"device ceiling (full N={N}): {device_ex_s:,.0f} ex/s", flush=True)

    # ---- end-to-end: real loop with bucketing + SL + per-step dispatch
    pp, oo = params, opt_state
    for i in range(args.warmup):  # compile every bucket
        pp, oo, loss = trainer.train_step(
            pp, oo, next(it), jax.random.fold_in(rng, i)
        )
    float(loss)
    t0 = time.perf_counter()
    for i in range(args.steps):
        pp, oo, loss = trainer.train_step(
            pp, oo, next(it), jax.random.fold_in(rng, 100 + i)
        )
    final_loss = float(loss)  # forces the whole chained sequence
    e2e_dt = time.perf_counter() - t0
    e2e_ex_s = args.steps * B / e2e_dt

    mem = None
    try:
        stats = jax.local_devices()[0].memory_stats()
        mem = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass
    row = {
        "corpus_rows": len(ds),
        "B": B,
        "N": N,
        "host_ex_s": round(host_ex_s),
        "device_ex_s": round(device_ex_s),
        "e2e_ex_s": round(e2e_ex_s),
        "host_over_device": round(host_ex_s / device_ex_s, 2),
        "e2e_over_device": round(e2e_ex_s / device_ex_s, 2),
        "final_loss": round(final_loss, 4),
        "peak_hbm_gib": mem,
        "native_reader": native,
    }
    print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
