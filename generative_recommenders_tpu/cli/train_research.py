"""Research training CLI.

TPU twin of `main.py:54-85` + `research/trainer/train.py` (train_fn): loads
a frozen preset (or a smoke config), builds the dataset from
sasrec_format.csv, and runs the training loop with periodic full-corpus
eval and Orbax checkpoints. The reference's one-process-per-GPU DDP spawn
disappears: a single process drives all local devices through pjit.

    python -m generative_recommenders_tpu.cli.train_research \
        --preset ml-1m/hstu-sampled-softmax-n128 \
        --data_csv tmp/ml-1m/sasrec_format.csv [--ckpt_dir ckpts/ml-1m]

    python -m generative_recommenders_tpu.cli.train_research --smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import time

import jax

logger = logging.getLogger(__name__)


def run_smoke() -> None:
    """Tiny synthetic end-to-end run (debug fixture analogue)."""
    from generative_recommenders_tpu.data.dataset import (
        SequenceDataset,
        synthetic_user_sequences,
    )
    from generative_recommenders_tpu.models.sequential import ModelConfig
    from generative_recommenders_tpu.train.train_loop import (
        TrainConfig,
        train_loop,
    )

    seqs = synthetic_user_sequences(
        num_users=256, num_items=200, max_len=32, seed=0
    )
    train_ds = SequenceDataset(seqs, max_sequence_length=32, ignore_last_n=1)
    eval_ds = SequenceDataset(seqs, max_sequence_length=32, ignore_last_n=0)
    cfg = TrainConfig(
        model=ModelConfig(
            num_items=200, max_sequence_len=32, gr_output_length=1,
            item_embedding_dim=32, num_blocks=2, num_heads=2, dqk=16, dv=16,
            # smoke exercises the bias-free pallas path on TPU (the
            # in-kernel rel-bias path has its own differential suite)
            attn_kernel=(
                "pallas" if jax.default_backend() == "tpu" else "xla"
            ),
            enable_relative_attention_bias=(
                jax.default_backend() != "tpu"
            ),
        ),
        local_batch_size=32,
        eval_batch_size=32,
        num_epochs=4,
        num_negatives=32,
    )
    out = train_loop(cfg, train_ds, eval_ds, log_every=10)
    final = out["history"][-1]
    logger.info("smoke done: %s", {k: round(float(v), 4) for k, v in final.items()})


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default=None)
    p.add_argument("--data_csv", default=None)
    p.add_argument(
        "--multifile_prefix", default=None,
        help="sharded fractal-expansion corpus prefix (e.g. "
        "build/ml20mx4/2x2) — the ML-1B/3B MultiFile path",
    )
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--save_ckpt_every_n", type=int, default=10)
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--attn_kernel", default=None, choices=["xla", "pallas"])
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--list_presets", action="store_true")
    p.add_argument(
        "--stochastic_length_alpha", type=float, default=None,
        help="SL sampling alpha (`common.py:204-216`); 0/unset = off",
    )
    p.add_argument(
        "--seq_len_buckets", default=None,
        help="comma-separated compile buckets, e.g. 64,128,200",
    )
    # multi-host bootstrap (MASTER_ADDR/WORLD_SIZE analogues,
    # `research/trainer/train.py:73-79`); on Cloud TPU pods pass only
    # --distributed and the rest is inferred from the environment
    # anomaly-mode twin (`research/trainer/train.py:302`
    # set_detect_anomaly): fail fast on the first NaN/Inf under jit
    p.add_argument("--debug_nans", action="store_true")
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args()

    from generative_recommenders_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if args.distributed:
        from generative_recommenders_tpu.parallel.distributed import (
            initialize_distributed,
        )

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from generative_recommenders_tpu.configs.research import RESEARCH_PRESETS

    if args.list_presets:
        for k in RESEARCH_PRESETS:
            print(k)
        return
    if args.smoke:
        run_smoke()
        return

    from generative_recommenders_tpu.data.dataset import (
        SequenceDataset,
        load_sasrec_format_csv,
    )
    from generative_recommenders_tpu.train.train_loop import train_loop
    from generative_recommenders_tpu.utils.checkpoint import save_checkpoint

    assert args.preset in RESEARCH_PRESETS, (
        f"unknown preset {args.preset}; use --list_presets"
    )
    cfg = RESEARCH_PRESETS[args.preset]
    overrides = {}
    if args.num_epochs is not None:
        overrides["num_epochs"] = args.num_epochs
    if args.attn_kernel is not None:
        overrides["model"] = dataclasses.replace(
            cfg.model, attn_kernel=args.attn_kernel
        )
    if args.stochastic_length_alpha is not None:
        overrides["stochastic_length_alpha"] = args.stochastic_length_alpha
    if args.seq_len_buckets is not None:
        overrides["seq_len_buckets"] = tuple(
            int(x) for x in args.seq_len_buckets.split(",")
        )
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    N = cfg.model.max_sequence_len
    if args.multifile_prefix:
        # sharded fractal-expansion corpora (ML-1B/3B scale); reference
        # `MultiFileDatasetV2` path (`research/data/dataset.py:194-249`)
        from generative_recommenders_tpu.data.dataset import (
            MultiFileSequenceDataset,
        )

        train_ds = MultiFileSequenceDataset(
            args.multifile_prefix, max_sequence_length=N, ignore_last_n=1
        )
        eval_ds = MultiFileSequenceDataset(
            args.multifile_prefix, max_sequence_length=N, ignore_last_n=0
        )
    elif args.data_csv:
        seqs = load_sasrec_format_csv(args.data_csv)
        # reference split: train ignores the last item, eval targets it
        # (`research/data/reco_dataset.py:39-178` chronological split)
        train_ds = SequenceDataset(seqs, max_sequence_length=N, ignore_last_n=1)
        eval_ds = SequenceDataset(seqs, max_sequence_length=N, ignore_last_n=0)
    else:
        from generative_recommenders_tpu.data.reco_dataset import (
            get_reco_dataset,
        )

        dataset_name = args.preset.split("/")[0]
        reco = get_reco_dataset(dataset_name, N)
        train_ds, eval_ds = reco.train_dataset, reco.eval_dataset
    logger.info(
        "dataset: %d users, %d items; devices: %s",
        len(train_ds), cfg.model.num_items, jax.devices(),
    )
    t0 = time.time()
    if jax.process_count() > 1:
        from generative_recommenders_tpu.parallel.train import (
            distributed_train_loop,
        )

        out = distributed_train_loop(cfg, train_ds, eval_ds)
    else:
        out = train_loop(
            cfg, train_ds, eval_ds,
            ckpt_dir=args.ckpt_dir,
            save_ckpt_every_n=args.save_ckpt_every_n if args.ckpt_dir else 0,
        )
    logger.info("training done in %.1fs", time.time() - t0)
    if args.ckpt_dir:
        path = save_checkpoint(
            args.ckpt_dir,
            {"params": out["params"], "opt_state": out["opt_state"]},
            step=cfg.num_epochs,
        )
        logger.info("checkpoint -> %s", path)
    for m in out["history"][-1:]:
        logger.info("final eval: %s", {k: round(float(v), 4) for k, v in m.items()})


if __name__ == "__main__":
    main()
