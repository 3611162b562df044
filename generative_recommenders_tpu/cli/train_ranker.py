"""DLRM-v3 ranker training CLI.

TPU twin of `dlrm_v3/train/train_ranker.py:111-140`:

    python -m generative_recommenders_tpu.cli.train_ranker \
        --dataset debug --mode train --num_batches 50 [--mesh 4x2]
"""

from __future__ import annotations

import argparse
import logging

import jax

logger = logging.getLogger(__name__)


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    p = argparse.ArgumentParser()
    p.add_argument(
        "--dataset", default="debug",
        choices=["debug", "movielens-1m", "movielens-20m", "kuairand-1k"],
    )
    p.add_argument("--mode", default="train", choices=["train", "eval"])
    p.add_argument(
        "--data_file", default=None,
        help="dataset CSV (sasrec_format.csv for movielens, "
        "processed_seqs.csv for kuairand); defaults to the preprocess "
        "CLIs' output conventions",
    )
    p.add_argument("--num_batches", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_uih_len", type=int, default=256)
    p.add_argument("--max_num_candidates", type=int, default=10)
    p.add_argument("--hash_size", type=int, default=100_000)
    p.add_argument("--mesh", default=None, help="e.g. 4x2 (data x model)")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--output_trace", action="store_true")
    p.add_argument("--attn_kernel", default=None, choices=["xla", "pallas"])
    p.add_argument("--stochastic_depth", type=float, default=0.0)
    p.add_argument("--l2_max_len", type=int, default=0)
    # multi-host bootstrap (`dlrm_v3/train/utils.py:72-93` analogue)
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

    from generative_recommenders_tpu.configs.dlrm import (
        get_embedding_table_config,
        get_hstu_configs,
    )
    from generative_recommenders_tpu.data.dlrm_dataset import (
        DLRMv3RandomDataset,
    )
    from generative_recommenders_tpu.parallel.mesh import make_mesh
    from generative_recommenders_tpu.train.dlrm_train import (
        DlrmTrainConfig,
        DlrmTrainer,
        eval_loop,
        train_loop,
    )

    attn = args.attn_kernel or (
        "pallas" if jax.default_backend() == "tpu" else "xla"
    )
    hstu_cfg = get_hstu_configs(
        args.dataset,
        max_uih_len=args.max_uih_len,
        max_num_candidates=args.max_num_candidates,
        attn_kernel=attn,
    )
    if args.stochastic_depth or args.l2_max_len:
        import dataclasses as _dc

        hstu_cfg = _dc.replace(
            hstu_cfg,
            hstu_stochastic_depth_ratio=args.stochastic_depth,
            hstu_l2_max_len=args.l2_max_len,
        )
    tables = get_embedding_table_config(
        args.dataset, hash_size=args.hash_size,
        dim=hstu_cfg.hstu_embedding_table_dim,
    )
    mesh = None
    if args.mesh:
        d, m = (int(x) for x in args.mesh.split("x"))
        mesh = make_mesh(shape=(d, m))
    trainer = DlrmTrainer(
        hstu_cfg,
        tables,
        DlrmTrainConfig(
            batch_size=args.batch_size,
            num_batches=args.num_batches,
            ckpt_dir=args.ckpt_dir,
            output_trace=args.output_trace,
        ),
        mesh=mesh,
    )
    batches = _make_batches(args, hstu_cfg)
    if args.mode == "train":
        out = train_loop(trainer, batches)
        logger.info(
            "done: %.1f examples/s; metrics %s",
            out["examples_per_s"],
            {k: round(v, 5) for k, v in out["metrics"].items()},
        )
    else:
        # eval from checkpoint
        assert args.ckpt_dir, "--ckpt_dir required for eval"
        batch0 = next(_make_batches(args, hstu_cfg, num_batches=1))
        from generative_recommenders_tpu.train.dlrm_train import _to_device
        from generative_recommenders_tpu.utils.checkpoint import (
            restore_checkpoint,
        )

        params, _ = trainer.init_sharded(
            jax.random.PRNGKey(0), _to_device(batch0)
        )
        params = restore_checkpoint(args.ckpt_dir, params)
        m = eval_loop(trainer, params, _make_batches(args, hstu_cfg))
        logger.info("eval metrics: %s", {k: round(v, 5) for k, v in m.items()})


def _make_batches(args, hstu_cfg, num_batches=None):
    """Real-dataset wiring (`dlrm_v3/train/utils.py:271-317` analogue) via
    the shared factory (`data/dlrm_factory.py`)."""
    from generative_recommenders_tpu.data.dlrm_factory import (
        make_dlrm_batches,
    )

    return make_dlrm_batches(
        args.dataset, hstu_cfg,
        data_file=args.data_file,
        hash_size=args.hash_size,
        batch_size=args.batch_size,
        num_batches=num_batches or args.num_batches,
        shuffle=args.mode == "train",
    )


if __name__ == "__main__":
    main()
