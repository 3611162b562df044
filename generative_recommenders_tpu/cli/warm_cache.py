"""Ahead-of-time compile-cache warmer.

Big HSTU shapes take minutes to compile (tens of minutes through a
remote-compile relay); every CLI already persists compiled executables via
the XLA compilation cache (`utils/compile_cache.py`). This CLI pre-fills
that cache for the shapes a deployment will hit — research train steps per
seq-len bucket, the serving dense one-pass, and the M-FALCON
prefill/score-chunk pair — using `jit(...).lower(...).compile()` so nothing
executes and no data is needed. Run it once per machine (or bake the cache
dir into the image) and training/serving start warm.

The reference has no equivalent (torch.compile caches per process); on TPU
the persistent cache makes warm-start a deployable artifact.

    python -m generative_recommenders_tpu.cli.warm_cache \
        --research_preset ml-20m/hstu-sampled-softmax-n128-large \
        --buckets 64,128,200
    python -m generative_recommenders_tpu.cli.warm_cache \
        --serving --max_uih_len 512 --max_num_candidates 160 --batch_size 32
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _timed_compile(name: str, fn, *args, **kwargs) -> None:
    t0 = time.time()
    fn_l = jax.jit(fn).lower(*args, **kwargs)
    fn_l.compile()
    logger.info("compiled %s in %.1fs", name, time.time() - t0)


def warm_research(preset: str, buckets, batch_size: int, attn_kernel) -> None:
    from generative_recommenders_tpu.configs.research import RESEARCH_PRESETS
    from generative_recommenders_tpu.train.train_loop import ResearchTrainer

    cfg = RESEARCH_PRESETS[preset]
    over = {}
    if batch_size:
        over["local_batch_size"] = batch_size
    if attn_kernel:
        over["model"] = dataclasses.replace(cfg.model, attn_kernel=attn_kernel)
    if over:
        cfg = dataclasses.replace(cfg, **over)
    trainer = ResearchTrainer(cfg, np.arange(1, cfg.model.num_items + 1))
    rng = jax.random.PRNGKey(0)
    params = trainer.init_params(rng)
    opt_state = trainer.init_opt_state(params)
    B = cfg.local_batch_size
    widths = sorted(
        {int(b) for b in buckets if int(b) <= cfg.model.max_sequence_len}
        | {cfg.model.max_sequence_len}
    )
    for N in widths:
        batch = {
            "historical_ids": jnp.zeros((B, N), jnp.int64),
            "historical_ratings": jnp.ones((B, N), jnp.int64),
            "historical_timestamps": jnp.ones((B, N), jnp.int64),
            "history_lengths": jnp.ones((B,), jnp.int64),
            "target_ids": jnp.ones((B,), jnp.int64),
            "target_ratings": jnp.ones((B,), jnp.int64),
            "target_timestamps": jnp.ones((B,), jnp.int64),
        }
        _timed_compile(
            f"train_step[N={N}]",
            trainer._train_step_impl,
            params, opt_state, batch, rng,
        )


def warm_serving(args) -> None:
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
    cfg = get_hstu_configs(
        args.dataset, max_uih_len=args.max_uih_len,
        max_num_candidates=args.max_num_candidates, attn_kernel=attn,
    )
    if args.candidates_per_chunk:
        cfg = dataclasses.replace(
            cfg, max_num_candidates_inference=args.candidates_per_chunk
        )
    tables = get_embedding_table_config(
        args.dataset, hash_size=args.hash_size,
        dim=cfg.hstu_embedding_table_dim,
    )
    model = DlrmHSTU(cfg, tables)
    raw = next(
        iter(
            make_dlrm_batches(
                args.dataset, cfg, hash_size=args.hash_size,
                batch_size=args.batch_size, num_batches=1,
            )
        )
    )
    uih = {k: jnp.asarray(v) for k, v in raw[0].items()}
    ul = jnp.asarray(raw[1])
    cands = {k: jnp.asarray(v) for k, v in raw[2].items()}
    nc = jnp.asarray(raw[3])
    params = model.init(jax.random.PRNGKey(0), uih, ul, cands, nc, True)
    family = HSTUModelFamily(model, params, quantize=True)
    seq_emb, payloads = family._sparse(uih, ul, cands)
    _timed_compile(
        "serving_sparse", family._sparse_impl, uih, ul, cands
    )
    _timed_compile(
        "serving_dense", family._dense_impl, seq_emb, payloads, ul, nc
    )
    qt = cands[cfg.candidates_querytime_feature_name][:, 0]
    caches, _ = family._prefill(uih, ul, qt)
    _timed_compile("mfalcon_prefill", family._prefill_impl, uih, ul, qt)
    m = cfg.max_num_candidates_inference
    chunk = {k: v[:, :m] for k, v in cands.items()}
    _timed_compile(
        "mfalcon_score_chunk", family._score_chunk_impl, caches, chunk, qt
    )


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    from generative_recommenders_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--research_preset", default=None)
    p.add_argument("--buckets", default="")
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--attn_kernel", default=None, choices=["xla", "pallas"])
    p.add_argument("--serving", action="store_true")
    p.add_argument("--dataset", default="debug")
    p.add_argument("--hash_size", type=int, default=10000)
    p.add_argument("--max_uih_len", type=int, default=128)
    p.add_argument("--max_num_candidates", type=int, default=10)
    p.add_argument("--candidates_per_chunk", type=int, default=0)
    args = p.parse_args()

    if args.research_preset:
        warm_research(
            args.research_preset,
            [b for b in args.buckets.split(",") if b],
            args.batch_size,
            args.attn_kernel,
        )
    if args.serving:
        warm_serving(args)
    if not args.research_preset and not args.serving:
        raise SystemExit("nothing to warm: pass --research_preset or --serving")


if __name__ == "__main__":
    main()
