"""e2e: real-dataset + trained-checkpoint serving accuracy (VERDICT round-2
missing #2/#6). Train a tiny ranker on a KuaiRand-format fixture with a
learnable label, save the Orbax checkpoint, then run the serving harness's
accuracy mode (`inference/main.py --dataset ... --ckpt_dir ...`) and require
the trained checkpoint to measurably beat fresh-init on the same data.

Reference: `dlrm_v3/inference/main.py:229-357` (dataset + DMP checkpoint
into the model family, accuracy run).
"""

import dataclasses

import numpy as np
import pandas as pd

import jax

from generative_recommenders_tpu.configs.dlrm import (
    get_embedding_table_config,
    get_hstu_configs,
)
from generative_recommenders_tpu.parallel.mesh import make_mesh
from generative_recommenders_tpu.train.dlrm_train import (
    DlrmTrainConfig,
    DlrmTrainer,
    train_loop,
)

_TINY = dict(
    hstu_attn_num_layers=1,
    hstu_embedding_table_dim=8,
    hstu_transducer_embedding_dim=16,
    hstu_attn_linear_dim=8,
    hstu_attn_qk_dim=8,
    hstu_num_heads=2,
    hstu_input_dropout_ratio=0.0,
    hstu_linear_dropout_rate=0.0,
)
_HASH, _B, _UIH, _M = 64, 8, 8, 2


def _write_fixture(path, n_users=48, seed=0):
    """KuaiRand-format seq log whose is_click label (action_weight bit 1)
    is exactly 'video_id is even' — learnable from the item embedding."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        n = int(rng.integers(_UIH + _M, _UIH + _M + 5))
        vids = rng.integers(1, _HASH, n)
        weights = (vids % 2 == 0).astype(np.int64)  # bit 1 = is_click
        ts = np.sort(rng.integers(1, 10_000_000, n))
        watch = rng.integers(0, 1000, n)
        # list columns are JSON-encoded, matching the preprocess CLI output
        rows.append(
            {
                "user_id": u + 1,
                "video_id": str(list(map(int, vids))),
                "action_weights": str(list(map(int, weights))),
                "time_ms": str(list(map(int, ts))),
                "play_time_ms": str(list(map(int, watch))),
            }
        )
    pd.DataFrame(rows).to_csv(path, index=False)


def _tiny_cfg():
    cfg = get_hstu_configs(
        "kuairand-1k", max_uih_len=_UIH, max_num_candidates=_M,
        attn_kernel="xla",
    )
    return dataclasses.replace(cfg, **_TINY)


def test_serving_accuracy_trained_ckpt_beats_fresh(tmp_path):
    data_file = str(tmp_path / "processed_seqs.csv")
    _write_fixture(data_file)
    ckpt_dir = str(tmp_path / "ckpt")

    # ---- train on the fixture, save the checkpoint
    cfg = _tiny_cfg()
    tables = get_embedding_table_config(
        "kuairand-1k", hash_size=_HASH, dim=cfg.hstu_embedding_table_dim
    )
    mesh = make_mesh(shape=(2, 2), devices=jax.devices("cpu")[:4])
    trainer = DlrmTrainer(
        cfg, tables,
        DlrmTrainConfig(
            batch_size=_B, num_batches=60, ckpt_dir=ckpt_dir,
            dense_lr=5e-3, sparse_lr=0.1,
        ),
        mesh=mesh,
    )

    from generative_recommenders_tpu.data.dlrm_factory import (
        make_dlrm_batches,
    )

    def epochs(n_epochs):
        for e in range(n_epochs):
            for batch in make_dlrm_batches(
                "kuairand-1k", cfg, data_file=data_file, hash_size=_HASH,
                batch_size=_B, shuffle=True, seed=e,
            ):
                if batch[1].shape[0] == _B:
                    yield batch

    out = train_loop(trainer, epochs(10))
    assert np.isfinite(out["metrics"]["is_click/ne"])

    # ---- serve: accuracy mode on the same data, trained vs fresh params
    from generative_recommenders_tpu.inference import main as serve_main

    def run(with_ckpt):
        argv = [
            "--accuracy",
            "--dataset", "kuairand-1k",
            "--data_file", data_file,
            "--batch_size", str(_B),
            "--max_uih_len", str(_UIH),
            "--max_num_candidates", str(_M),
            "--hash_size", str(_HASH),
            "--num_qsl_batches", "6",
            "--num_warmups", "1",
            "--attn_kernel", "xla",
            "--num_layers", str(_TINY["hstu_attn_num_layers"]),
            "--transducer_dim", str(_TINY["hstu_transducer_embedding_dim"]),
            "--table_dim", str(_TINY["hstu_embedding_table_dim"]),
            "--attn_dim", str(_TINY["hstu_attn_qk_dim"]),
            "--num_heads", str(_TINY["hstu_num_heads"]),
            "--accuracy_log", str(tmp_path / "acc.json"),
        ]
        if with_ckpt:
            argv += ["--ckpt_dir", ckpt_dir]
        return serve_main.main(argv)

    fresh = run(with_ckpt=False)
    trained = run(with_ckpt=True)
    assert np.isfinite(trained["is_click/ne"])
    # trained int8-served model must beat fresh-init on the served data:
    # better (lower) normalized entropy AND better (higher) AUC
    assert trained["is_click/ne"] < fresh["is_click/ne"], (trained, fresh)
    assert trained["is_click/auc"] > max(0.6, fresh["is_click/auc"]), (
        trained, fresh,
    )
