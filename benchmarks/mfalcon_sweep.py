"""M-FALCON crossover sweep: dense one-pass vs KV-cached chunked scoring.

Sweeps (uih, M, chunk, prefill-reuse R) and records scored-candidates/s for
both serving paths, so the regime where the cached path *wins* is measured
rather than asserted. The designed winning regime
(`dlrm_v3/inference/model_family.py`, M-FALCON paper §4) is incremental
scoring of NEW candidate sets against an already-encoded user state: one
prefill amortized over R candidate-set scorings, each a single delta-q
dispatch (Pallas cached-decode kernel at N >= 512 on TPU) that does
O(M * N) work instead of the dense path's O(N^2) re-encode.

Timing: wall clock over Q requests with a per-request host sync (the same
methodology as the round-2 serving table — the axon relay's
block_until_ready is asynchronous, so the sync is the honest completion
marker; the ~1-3 ms relay tax applies equally to both paths).

Usage:
  python benchmarks/mfalcon_sweep.py [--uih 512 1024] [--m 40 160]
      [--chunks 0 20] [--reuse 1 4 16] [--batch 16] [--queries 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from generative_recommenders_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--uih", type=int, nargs="+", default=[512, 1024])
    p.add_argument("--m", type=int, nargs="+", default=[40, 160])
    p.add_argument(
        "--chunks", type=int, nargs="+", default=[0],
        help="M-FALCON chunk sizes; 0 = whole candidate set in one chunk",
    )
    p.add_argument("--reuse", type=int, nargs="+", default=[1, 4, 16])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--queries", type=int, default=8)
    p.add_argument("--hash_size", type=int, default=10000)
    p.add_argument("--attn_kernel", default=None, choices=["xla", "pallas"])
    p.add_argument("--out", default="")
    args = p.parse_args()

    from generative_recommenders_tpu.configs.dlrm import (
        get_embedding_table_config,
        get_hstu_configs,
    )
    from generative_recommenders_tpu.data.dlrm_factory import (
        make_dlrm_batches,
    )
    from generative_recommenders_tpu.inference.model_family import (
        HSTUModelFamily,
    )
    from generative_recommenders_tpu.modules.dlrm_hstu import DlrmHSTU

    attn = args.attn_kernel or (
        "pallas" if jax.default_backend() == "tpu" else "xla"
    )
    results = []
    for uih in args.uih:
        for M in args.m:
          try:
            cfg = get_hstu_configs(
                "debug", max_uih_len=uih, max_num_candidates=M,
                attn_kernel=attn,
            )
            tables = get_embedding_table_config(
                "debug", hash_size=args.hash_size,
                dim=cfg.hstu_embedding_table_dim,
            )
            model = DlrmHSTU(cfg, tables)
            raw = next(
                iter(
                    make_dlrm_batches(
                        "debug", cfg, hash_size=args.hash_size,
                        batch_size=args.batch, num_batches=1,
                    )
                )
            )
            s_uih = {k: jnp.asarray(v) for k, v in raw[0].items()}
            s_ul = jnp.asarray(raw[1])
            s_cands = {k: jnp.asarray(v) for k, v in raw[2].items()}
            s_nc = jnp.asarray(raw[3])
            params = model.init(
                jax.random.PRNGKey(0), s_uih, s_ul, s_cands, s_nc, True
            )
            family = HSTUModelFamily(model, params, quantize=True)
            qt = s_cands[cfg.candidates_querytime_feature_name][:, 0]
            B = args.batch

            def sync(x):
                jax.block_until_ready(x)
                float(jnp.sum(x))

            def run_dense(R):
                # R candidate sets, dense path: R full passes
                for _ in range(R):
                    sync(family.predict(s_uih, s_ul, s_cands, s_nc))

            def run_cached(R, chunk):
                caches, _ = family._prefill(s_uih, s_ul, qt)
                m = chunk or M
                for _ in range(R):
                    preds = []
                    for c0 in range(0, M, m):
                        ch = {
                            k: v[:, c0 : c0 + m] for k, v in s_cands.items()
                        }
                        preds.append(family._score_chunk(caches, ch, qt))
                    sync(preds[-1])

            for R in args.reuse:
                variants = [("dense", 0, lambda R=R: run_dense(R))]
                for chunk in args.chunks:
                    variants.append(
                        (
                            "cached", chunk or M,
                            lambda R=R, c=chunk: run_cached(R, c),
                        )
                    )
                for name, chunk, fn in variants:
                    fn()  # warmup (compile)
                    t0 = time.perf_counter()
                    for _ in range(args.queries):
                        fn()
                    dt = time.perf_counter() - t0
                    cands_per_s = args.queries * R * B * M / dt
                    row = {
                        "path": name, "uih": uih, "M": M, "chunk": chunk,
                        "reuse": R, "batch": B,
                        "scored_candidates_per_s": round(cands_per_s),
                        "ms_per_group": round(dt / args.queries * 1e3, 1),
                    }
                    results.append(row)
                    print(json.dumps(row), flush=True)
          except Exception as e:  # keep sweeping the remaining shapes
            print(
                json.dumps(
                    {"uih": uih, "M": M, "error": str(e)[:200]}
                ),
                flush=True,
            )
    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
