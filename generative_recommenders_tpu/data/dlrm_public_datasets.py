"""Public-data datasets for the production (DlrmHSTU) stack.

TPU twins of `dlrm_v3/datasets/movie_lens.py:31-166`
(DLRMv3MovieLensDataset), `dlrm_v3/datasets/kuairand.py:32-163`
(DLRMv3KuaiRandDataset), `dlrm_v3/datasets/synthetic_movie_lens.py:27-79`,
and the seq utils (`datasets/utils.py:20-45`): each user row's LAST
`max_num_candidates` events become the candidates, the rest (truncated to
`max_uih_len`) the uih; contextual features ride along; query time = max
uih timestamp. Output is the padded batch dict format of
`data/dlrm_dataset.py` instead of KeyedJaggedTensors.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from generative_recommenders_tpu.modules.dlrm_hstu import DlrmHSTUConfig


def separate_uih_candidates(
    x: Any, candidates_max_seq_len: int
) -> Tuple[List[int], List[int]]:
    """`datasets/utils.py:20-36`."""
    if isinstance(x, str):
        if not (x.startswith("[") and x.endswith("]")):
            x = "[" + x + "]"
        y = json.loads(x)
    else:
        y = x
    y_list = [y] if isinstance(y, (int, np.integer)) else list(y)
    return (
        y_list[:-candidates_max_seq_len],
        y_list[-candidates_max_seq_len:],
    )


def maybe_truncate_seq(y: List[int], max_seq_len: int) -> List[int]:
    return y[:max_seq_len] if len(y) > max_seq_len else y


def process_and_hash_x(x: Any, hash_size: int) -> Any:
    """`kuairand.py:32-39`."""
    if isinstance(x, str):
        x = json.loads(x)
    if isinstance(x, list):
        return [int(v) % hash_size for v in x]
    return int(x) % hash_size


class _PaddedPublicDataset:
    """Common padded batching over per-row (uih dict, cand dict) samples."""

    def __init__(self, cfg: DlrmHSTUConfig, is_inference: bool = False):
        self._cfg = cfg
        self._M = (
            cfg.max_num_candidates_inference
            if is_inference
            else cfg.max_num_candidates
        )

    def __len__(self) -> int:
        raise NotImplementedError

    def load_item(self, idx: int):
        raise NotImplementedError

    def batches(
        self, batch_size: int, num_batches: Optional[int] = None,
        shuffle: bool = False, seed: int = 0,
    ) -> Iterator[Tuple]:
        cfg, M = self._cfg, self._M
        Nu = cfg.max_uih_len
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        batch_uih: Dict[str, list] = {}
        rows: List[Tuple] = []
        emitted = 0
        for idx in order:
            item = self.load_item(int(idx))
            if item is None:
                continue
            rows.append(item)
            if len(rows) == batch_size:
                yield self._collate(rows)
                rows = []
                emitted += 1
                if num_batches is not None and emitted >= num_batches:
                    return
        if rows and (num_batches is None or emitted < num_batches):
            yield self._collate(rows)

    def _collate(self, rows: List[Tuple]) -> Tuple:
        cfg, M, Nu = self._cfg, self._M, self._cfg.max_uih_len
        B = len(rows)
        uih_names = rows[0][0].keys()
        cand_names = rows[0][2].keys()
        uih_lengths = np.asarray([r[1] for r in rows], np.int32)
        num_candidates = np.asarray([r[3] for r in rows], np.int32)
        uih_features = {}
        for name in uih_names:
            first = rows[0][0][name]
            width = 1 if np.isscalar(first) or np.ndim(first) == 0 else Nu
            arr = np.zeros((B, width), np.int64)
            for b, r in enumerate(rows):
                v = np.atleast_1d(np.asarray(r[0][name], np.int64))
                arr[b, : len(v)] = v[:width]
            uih_features[name] = arr
        cand_features = {}
        for name in cand_names:
            arr = np.zeros((B, M), np.int64)
            for b, r in enumerate(rows):
                v = np.atleast_1d(np.asarray(r[2][name], np.int64))
                arr[b, : len(v)] = v[:M]
            cand_features[name] = arr
        return uih_features, uih_lengths, cand_features, num_candidates


class DLRMv3MovieLensDataset(_PaddedPublicDataset):
    """`movie_lens.py:31-166` over sasrec_format.csv."""

    def __init__(
        self,
        cfg: DlrmHSTUConfig,
        ratings_file: str,
        is_inference: bool = False,
    ) -> None:
        super().__init__(cfg, is_inference)
        self._frame = pd.read_csv(ratings_file, delimiter=",")
        self._ctx = dict(cfg.contextual_feature_to_max_length)

    def __len__(self) -> int:
        return len(self._frame)

    def load_item(self, idx: int):
        cfg, M = self._cfg, self._M
        data = self._frame.iloc[idx]
        ids_uih, ids_cand = separate_uih_candidates(
            data.sequence_item_ids, M
        )
        if len(ids_uih) < 1:
            return None
        ratings_uih, _ = separate_uih_candidates(data.sequence_ratings, M)
        ts_uih, _ = separate_uih_candidates(data.sequence_timestamps, M)
        ids_uih = maybe_truncate_seq(ids_uih, cfg.max_uih_len)
        ratings_uih = maybe_truncate_seq(ratings_uih, cfg.max_uih_len)
        ts_uih = maybe_truncate_seq(ts_uih, cfg.max_uih_len)
        n = len(ids_uih)
        query_time = max(ts_uih)
        uih = {
            "movie_id": ids_uih,
            "action_timestamp": ts_uih,
            "dummy_weights": [0] * n,
            "dummy_watch_time": [0] * n,
        }
        for name in self._ctx:
            uih[name] = int(data[name]) if name in data else 0
        cands = {
            "item_movie_id": ids_cand,
            "item_query_time": [query_time] * M,
            "item_dummy_weights": [1] * M,
            "item_dummy_watchtime": [1] * M,
        }
        return uih, n, cands, M


class DLRMv3KuaiRandDataset(_PaddedPublicDataset):
    """`kuairand.py:32-163` over the KuaiRand processed seq-log CSV."""

    def __init__(
        self,
        cfg: DlrmHSTUConfig,
        seq_logs_file: str,
        hash_sizes: Optional[Dict[str, int]] = None,
        is_inference: bool = False,
    ) -> None:
        super().__init__(cfg, is_inference)
        self._frame = pd.read_csv(seq_logs_file, delimiter=",")
        self._ctx = dict(cfg.contextual_feature_to_max_length)
        for key, hash_size in (hash_sizes or {}).items():
            if key in self._frame.columns:
                self._frame[key] = self._frame[key].apply(
                    lambda x: process_and_hash_x(x, hash_size)
                )

    def __len__(self) -> int:
        return len(self._frame)

    def load_item(self, idx: int):
        cfg, M = self._cfg, self._M
        data = self._frame.iloc[idx]
        vids_uih, vids_cand = separate_uih_candidates(data.video_id, M)
        if len(vids_uih) < 1:
            return None
        w_uih, w_cand = separate_uih_candidates(data.action_weights, M)
        ts_uih, _ = separate_uih_candidates(data.time_ms, M)
        wt_uih, wt_cand = separate_uih_candidates(data.play_time_ms, M)
        vids_uih = maybe_truncate_seq(vids_uih, cfg.max_uih_len)
        w_uih = maybe_truncate_seq(w_uih, cfg.max_uih_len)
        ts_uih = maybe_truncate_seq(ts_uih, cfg.max_uih_len)
        wt_uih = maybe_truncate_seq(wt_uih, cfg.max_uih_len)
        n = len(vids_uih)
        query_time = max(ts_uih)
        uih = {
            "video_id": vids_uih,
            "action_timestamp": ts_uih,
            "action_weight": w_uih,
            "watch_time": wt_uih,
        }
        for name in self._ctx:
            uih[name] = int(data[name]) if name in data else 0
        cands = {
            "item_video_id": vids_cand,
            "item_action_weight": w_cand,
            "item_target_watchtime": wt_cand,
            "item_query_time": [query_time] * M,
        }
        return uih, n, cands, M
