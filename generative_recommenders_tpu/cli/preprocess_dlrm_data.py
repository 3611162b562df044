"""KuaiRand preprocessing for the production (DLRM-v3) stack.

TPU twin of `dlrm_v3/preprocess_public_data.py:37-211`
(DLRMKuaiRandProcessor): merges the standard log CSVs per user (sequence
columns aggregated as lists), packs the 8 boolean interaction columns into a
per-event action bitmask (is_click=1 … is_profile_enter=128), categorically
encodes the user range features, and writes processed_seqs.csv consumed by
`data/dlrm_public_datasets.DLRMv3KuaiRandDataset`.

    python -m generative_recommenders_tpu.cli.preprocess_dlrm_data \
        --dataset kuairand-1k --data_path tmp/
"""

from __future__ import annotations

import argparse
import logging
import os
import tarfile
from typing import Dict, List
from urllib.request import urlretrieve

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

SEQ_COLS = ["video_id", "time_ms", "action_weights", "play_time_ms", "duration_ms"]
USER_RANGE_COLS = [
    "user_active_degree",
    "follow_user_num_range",
    "fans_user_num_range",
    "friend_user_num_range",
    "register_days_range",
]


def get_feature_merge_weights(dataset: str = "debug") -> Dict[str, int]:
    """`dlrm_v3/preprocess_public_data.py:37-51`."""
    if "kuairand" in dataset:
        return {
            "is_click": 1,
            "is_like": 2,
            "is_follow": 4,
            "is_comment": 8,
            "is_forward": 16,
            "is_hate": 32,
            "long_view": 64,
            "is_profile_enter": 128,
        }
    return {"dummy": 1}


def _dataset_files(dataset: str, data_path: str):
    prefix = "KuaiRand-1K" if "1k" in dataset else "KuaiRand-27K"
    root = os.path.join(data_path, prefix, "data")
    if "1k" in dataset:
        logs = [
            f"{root}/log_standard_4_08_to_4_21_1k.csv",
            f"{root}/log_standard_4_22_to_5_08_1k.csv",
        ]
        users = f"{root}/user_features_1k.csv"
    else:
        logs = [
            f"{root}/log_standard_4_08_to_4_21_27k_part1.csv",
            f"{root}/log_standard_4_08_to_4_21_27k_part2.csv",
            f"{root}/log_standard_4_22_to_5_08_27k_part1.csv",
            f"{root}/log_standard_4_22_to_5_08_27k_part2.csv",
        ]
        users = f"{root}/user_features_27k.csv"
    return logs, users, f"{root}/processed_seqs.csv"


def preprocess_kuairand(
    dataset: str, data_path: str, log_files=None, user_features_file=None,
    output_file=None,
) -> str:
    """`preprocess_public_data.py:120-185`."""
    files, users_f, out_f = _dataset_files(dataset, data_path)
    log_files = log_files or files
    user_features_file = user_features_file or users_f
    output_file = output_file or out_f
    weights = get_feature_merge_weights(dataset)
    events = list(weights.keys())

    df = None
    for idx, log_file in enumerate(log_files):
        logger.info("processing %s", log_file)
        log_df = pd.read_csv(log_file, delimiter=",")
        g = log_df.groupby("user_id").agg(list).reset_index()
        for event, weight in weights.items():
            g[event] = g[event].apply(
                lambda seq, w=weight: np.where(np.asarray(seq) == 0, 0, w)
            )
        g["action_weights"] = g.apply(
            lambda row: [int(sum(x)) for x in zip(*[row[c] for c in events])],
            axis=1,
        )
        g = g[["user_id"] + SEQ_COLS]
        if df is None:
            df = g
        else:
            df = df.merge(g, on="user_id", suffixes=("_x", "_y"))
            for col in SEQ_COLS:
                df[col] = df.apply(
                    lambda row, c=col: row[c + "_x"] + row[c + "_y"], axis=1
                )
                df = df.drop(columns=[col + "_x", col + "_y"])

    lens = df["video_id"].apply(len)
    logger.info(
        "seq len: max %d, min %d, mean %.1f", lens.max(), lens.min(), lens.mean()
    )
    user_df = pd.read_csv(user_features_file, delimiter=",")
    for col in USER_RANGE_COLS:
        mapping = {cat: i + 1 for i, cat in enumerate(user_df[col].unique())}
        user_df[col] = user_df[col].map(mapping)
    final = pd.merge(df, user_df, on="user_id")
    final.to_csv(output_file, index=False, sep=",")
    logger.info("wrote %s (%d users)", output_file, len(final))
    return output_file


def download_kuairand(dataset: str, data_path: str) -> None:
    """`preprocess_public_data.py:108-118` (kuairand.com tarball)."""
    prefix = "KuaiRand-1K" if "1k" in dataset else "KuaiRand-27K"
    tar = os.path.join(data_path, f"{prefix}.tar.gz")
    if not os.path.exists(os.path.join(data_path, prefix)):
        if not os.path.exists(tar):
            os.makedirs(data_path, exist_ok=True)
            urlretrieve(
                f"https://zenodo.org/records/10439422/files/{prefix}.tar.gz",
                tar,
            )
        with tarfile.open(tar, "r:*") as t:
            t.extractall(data_path)


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument(
        "--dataset", default="kuairand-1k",
        choices=["kuairand-1k", "kuairand-27k"],
    )
    p.add_argument("--data_path", default="tmp/")
    p.add_argument("--skip_download", action="store_true")
    args = p.parse_args()
    if not args.skip_download:
        download_kuairand(args.dataset, args.data_path)
    preprocess_kuairand(args.dataset, args.data_path)


if __name__ == "__main__":
    main()
