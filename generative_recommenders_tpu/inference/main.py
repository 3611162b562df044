"""Serving benchmark harness (MLPerf-style).

TPU twin of `dlrm_v3/inference/main.py:202-385`: builds the model family
(int8 sparse + dense), warms up, runs the C++ load generator in the chosen
scenario, and reports qps + latency percentiles.

    python -m generative_recommenders_tpu.inference.main \
        --scenario Offline --num_queries 64 --batch_size 8 [--mfalcon]
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def main(argv=None) -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    # persist compiled executables so the long serving shapes (uih=512,
    # M-FALCON 40-candidate chunks) warm in seconds on re-runs instead of
    # recompiling for >10 min through the compile relay
    from generative_recommenders_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument(
        "--scenario", default="Offline",
        choices=["Offline", "Server", "SingleStream", "MultiStream"],
    )
    p.add_argument(
        "--samples_per_query", type=int, default=8,
        help="MultiStream: samples per query",
    )
    p.add_argument(
        "--target_latency_ms", type=float, default=0.0,
        help="per-query latency bound (0 = unconstrained); enables "
        "early stopping for the stream scenarios",
    )
    p.add_argument(
        "--accuracy", action="store_true",
        help="accuracy mode: run every QSL sample once, log predictions, "
        "report NE/AUC (`dlrm_v3/inference/main.py:281-357` accuracy run)",
    )
    p.add_argument("--accuracy_log", default="build/accuracy_log.json")
    p.add_argument("--target_qps", type=float, default=20.0)
    p.add_argument("--num_queries", type=int, default=64)
    p.add_argument("--min_duration_ms", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_uih_len", type=int, default=128)
    p.add_argument("--max_num_candidates", type=int, default=10)
    p.add_argument("--hash_size", type=int, default=10000)
    p.add_argument("--num_warmups", type=int, default=2)
    p.add_argument("--data_producer_threads", type=int, default=1)
    p.add_argument("--mfalcon", action="store_true", help="KV-cached scoring")
    p.add_argument(
        "--candidates_per_chunk", type=int, default=0,
        help="M-FALCON chunk size (max_num_candidates_inference); 0 = config default",
    )
    p.add_argument("--no_quantize", action="store_true")
    p.add_argument("--attn_kernel", default=None, choices=["xla", "pallas"])
    # real-dataset + trained-checkpoint serving
    # (`dlrm_v3/inference/main.py:229-276`, `model_family.py:129,232`)
    p.add_argument(
        "--dataset", default="debug",
        choices=["debug", "movielens-1m", "movielens-20m", "kuairand-1k"],
        help="serve (and score accuracy) on a real preprocessed dataset "
        "instead of the random fixture",
    )
    p.add_argument("--data_file", default=None)
    p.add_argument(
        "--ckpt_dir", default=None,
        help="restore trained params from this Orbax checkpoint into the "
        "model family (tables re-quantized from the restored values)",
    )
    p.add_argument("--num_qsl_batches", type=int, default=8)
    # model-size overrides (0 = dataset-config default) — the reference
    # overrides these via gin; needed so a served checkpoint's geometry can
    # be reproduced exactly (and for fixture-scale e2e tests)
    p.add_argument("--num_layers", type=int, default=0)
    p.add_argument("--transducer_dim", type=int, default=0)
    p.add_argument("--table_dim", type=int, default=0)
    p.add_argument("--attn_dim", type=int, default=0)
    p.add_argument("--num_heads", type=int, default=0)
    args = p.parse_args(argv)

    from generative_recommenders_tpu.configs.dlrm import (
        get_embedding_table_config,
        get_hstu_configs,
    )
    from generative_recommenders_tpu.inference.data_producer import (
        MultiThreadDataProducer,
        SingleThreadDataProducer,
    )
    from generative_recommenders_tpu.inference.loadgen import (
        Scenario,
        TestSettings,
        query_complete,
        start_test,
    )
    from generative_recommenders_tpu.inference.model_family import (
        HSTUModelFamily,
    )
    from generative_recommenders_tpu.modules.dlrm_hstu import DlrmHSTU

    attn = args.attn_kernel or (
        "pallas" if jax.default_backend() == "tpu" else "xla"
    )
    cfg = get_hstu_configs(
        args.dataset if args.dataset != "debug" else "debug",
        max_uih_len=args.max_uih_len,
        max_num_candidates=args.max_num_candidates,
        attn_kernel=attn,
    )
    import dataclasses as _dc

    if args.candidates_per_chunk:
        cfg = _dc.replace(
            cfg, max_num_candidates_inference=args.candidates_per_chunk
        )
    overrides = {
        "hstu_attn_num_layers": args.num_layers,
        "hstu_transducer_embedding_dim": args.transducer_dim,
        "hstu_embedding_table_dim": args.table_dim,
        "hstu_attn_qk_dim": args.attn_dim,
        "hstu_attn_linear_dim": args.attn_dim,
        "hstu_num_heads": args.num_heads,
    }
    overrides = {k: v for k, v in overrides.items() if v}
    if overrides:
        cfg = _dc.replace(cfg, **overrides)
    tables = get_embedding_table_config(
        args.dataset if args.dataset != "debug" else "debug",
        hash_size=args.hash_size, dim=cfg.hstu_embedding_table_dim,
    )
    model = DlrmHSTU(cfg, tables)

    # fixed query set (QSL analogue); queries cycle through pre-made batches.
    # Real datasets route through the shared factory; partial tail batches
    # are dropped (one executable per shape).
    from generative_recommenders_tpu.data.dlrm_factory import (
        make_dlrm_batches,
    )

    samples = []
    for raw in make_dlrm_batches(
        args.dataset, cfg, data_file=args.data_file,
        hash_size=args.hash_size, batch_size=args.batch_size,
        num_batches=args.num_qsl_batches,
    ):
        if raw[1].shape[0] != args.batch_size:
            continue
        s_uih = {k: jnp.asarray(v) for k, v in raw[0].items()}
        s_cands = {k: jnp.asarray(v) for k, v in raw[2].items()}
        samples.append(
            (s_uih, jnp.asarray(raw[1]), s_cands, jnp.asarray(raw[3]))
        )
    assert samples, "dataset produced no full batches at this batch_size"

    uih, ul, cands, nc = samples[0]
    params = model.init(jax.random.PRNGKey(0), uih, ul, cands, nc, True)
    if args.ckpt_dir:
        from generative_recommenders_tpu.utils.checkpoint import (
            restore_checkpoint,
        )

        params = restore_checkpoint(args.ckpt_dir, params)
        logger.info("restored trained params from %s", args.ckpt_dir)
    family = HSTUModelFamily(model, params, quantize=not args.no_quantize)

    def predict(sample):
        s_uih, s_ul, s_cands, s_nc = sample
        if args.mfalcon:
            qt = s_cands[cfg.candidates_querytime_feature_name][:, 0]
            preds = family.predict_mfalcon(s_uih, s_ul, s_cands, qt)
        else:
            preds = family.predict(s_uih, s_ul, s_cands, s_nc)
        jax.block_until_ready(preds)
        # force a host sync so latency covers real completion (the axon
        # relay's block_until_ready is asynchronous — see bench.py notes)
        float(jnp.sum(preds))
        return preds

    logger.info("warmup x%d", args.num_warmups)
    for i in range(args.num_warmups):
        predict(samples[i % len(samples)])

    if args.accuracy:
        return _run_accuracy(args, cfg, samples, predict)

    if args.data_producer_threads > 1:
        producer = MultiThreadDataProducer(
            predict, args.data_producer_threads
        )
    else:
        producer = SingleThreadDataProducer(predict)

    def issue_query(qid: int) -> None:
        producer.enqueue(
            qid,
            samples[qid % len(samples)],
            lambda q, _preds: query_complete(q),
        )

    scenario = Scenario[
        {
            "Offline": "OFFLINE",
            "Server": "SERVER",
            "SingleStream": "SINGLE_STREAM",
            "MultiStream": "MULTI_STREAM",
        }[args.scenario]
    ]
    if scenario == Scenario.MULTI_STREAM:
        # one query = samples_per_query samples (processed as consecutive
        # batches inside a single completion window)
        batches_per_query = max(
            1, -(-args.samples_per_query // args.batch_size)
        )

        def issue_query(qid: int) -> None:  # noqa: F811
            def run_group(q, _s):
                for j in range(1, batches_per_query):
                    predict(samples[(q + j) % len(samples)])
                query_complete(q)

            producer.enqueue(
                qid, samples[qid % len(samples)],
                lambda q, _preds: run_group(q, None),
            )

    # MLPerf latency percentiles: p90 SingleStream, p99 MultiStream/Server
    pct = 0.9 if scenario == Scenario.SINGLE_STREAM else 0.99
    result = start_test(
        TestSettings(
            scenario=scenario,
            target_qps=args.target_qps,
            min_query_count=args.num_queries,
            min_duration_ms=args.min_duration_ms,
            target_latency_ms=args.target_latency_ms,
            target_percentile=pct,
            samples_per_query=args.samples_per_query,
        ),
        issue_query,
    )
    producer.shutdown()
    if scenario == Scenario.MULTI_STREAM:
        # one query = samples_per_query samples (the padded tail of the last
        # batch is not counted as scored work)
        cands_per_query = args.samples_per_query * args.max_num_candidates
    else:
        cands_per_query = args.batch_size * args.max_num_candidates
    result["scored_candidates_per_s"] = result["qps"] * cands_per_query
    logger.info(
        "scenario=%s result: %s",
        args.scenario,
        {k: round(v, 3) for k, v in result.items()},
    )
    print(result)
    return result


def _run_accuracy(args, cfg, samples, predict) -> None:
    """Accuracy mode: every QSL sample exactly once, single-threaded (the
    reference forces data_producer_threads=1 in accuracy runs,
    `dlrm_v3/inference/main.py:287-290`), predictions logged to JSON and
    NE/AUC computed against the dataset supervision."""
    import json
    import os

    import numpy as np

    from generative_recommenders_tpu.modules.multitask_module import (
        get_supervision_labels_and_weights,
    )
    from generative_recommenders_tpu.ops.padded import valid_mask
    from generative_recommenders_tpu.train.dlrm_metrics import MetricsLogger

    metrics = MetricsLogger(cfg.multitask_configs)
    log = []
    for qid, sample in enumerate(samples):
        s_uih, s_ul, s_cands, s_nc = sample
        preds = predict(sample)  # [T, B, M]
        labels_d, weights_d = get_supervision_labels_and_weights(
            s_cands[cfg.candidates_weight_feature_name],
            s_cands[cfg.candidates_watchtime_feature_name],
            cfg.multitask_configs,
        )
        cand_valid = valid_mask(s_nc, cfg.max_num_candidates)
        labels = jnp.stack(
            [labels_d[t.task_name] for t in cfg.multitask_configs]
        )
        cand_valid_f = cand_valid.astype(jnp.float32)
        weights = jnp.stack(
            [
                weights_d.get(t.task_name, cand_valid_f) * cand_valid_f
                for t in cfg.multitask_configs
            ]
        )
        metrics.update(preds, labels, weights)
        log.append(
            {
                "qsl_idx": qid,
                "data": np.asarray(preds, np.float32).reshape(-1).tolist(),
            }
        )
    os.makedirs(os.path.dirname(args.accuracy_log) or ".", exist_ok=True)
    with open(args.accuracy_log, "w") as f:
        json.dump(log, f)
    m = metrics.compute()
    logger.info(
        "accuracy mode: %d samples -> %s; log at %s",
        len(samples), {k: round(v, 5) for k, v in m.items()},
        args.accuracy_log,
    )
    print({"accuracy": {k: round(v, 5) for k, v in m.items()}})
    return m


if __name__ == "__main__":
    main()
