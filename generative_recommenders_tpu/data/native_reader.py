"""ctypes bindings to the native sharded-CSV corpus reader
(csrc/csv_reader.cpp): mmap'd shards, native line index, GIL-free row
parsing into int64 numpy buffers. Used by `MultiFileSequenceDataset` as the
fast path (python CSV parsing remains the fallback); gives the threaded
prefetcher real parallelism on the ML-3B-scale corpora.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "csrc", "csv_reader.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "build")
_LIB = os.path.join(_LIB_DIR, "libcsvreader.so")

_lib: Optional[ctypes.CDLL] = None
_I64P = ctypes.POINTER(ctypes.c_int64)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        os.makedirs(_LIB_DIR, exist_ok=True)
        if not (
            os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        ):
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    "-o", _LIB, _SRC,
                ],
                check=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.csv_open.argtypes = [ctypes.c_char_p, ctypes.c_int32, _I64P]
        lib.csv_open.restype = ctypes.c_int64
        lib.csv_num_rows.argtypes = [ctypes.c_int64]
        lib.csv_num_rows.restype = ctypes.c_int64
        lib.csv_user_id.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.csv_user_id.restype = ctypes.c_int64
        lib.csv_read_row.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _I64P, _I64P, ctypes.c_int64,
        ]
        lib.csv_read_row.restype = ctypes.c_int64
        lib.csv_close.argtypes = [ctypes.c_int64]
        _lib = lib
    except Exception as e:  # no g++ / build failure → python fallback
        logger.info("native csv reader unavailable (%s)", e)
        _lib = None
    return _lib


class NativeCorpus:
    """mmap'd sharded corpus; thread-safe reads without the GIL."""

    def __init__(
        self,
        prefix: str,
        row_counts,  # per-shard row counts (from <prefix>_users.csv)
        initial_cap: int = 4096,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native csv reader unavailable")
        self._lib = lib
        counts = np.asarray(row_counts, np.int64)
        self._h = lib.csv_open(
            prefix.encode(), len(counts), counts.ctypes.data_as(_I64P)
        )
        if self._h < 0:
            raise RuntimeError(f"csv_open failed for {prefix}")
        self._cap = initial_cap

    def __len__(self) -> int:
        return int(self._lib.csv_num_rows(self._h))

    def read_row(self, idx: int) -> Tuple[int, np.ndarray, np.ndarray]:
        cap = self._cap
        while True:
            items = np.empty(cap, np.int64)
            ratings = np.empty(cap, np.int64)
            n = self._lib.csv_read_row(
                self._h, idx,
                items.ctypes.data_as(_I64P),
                ratings.ctypes.data_as(_I64P),
                cap,
            )
            if n >= 0:
                uid = int(self._lib.csv_user_id(self._h, idx))
                return uid, items[:n], ratings[:n]
            if n == -1:
                raise IndexError(f"row {idx} unreadable")
            cap = max(cap * 2, -int(n))
            self._cap = cap

    def close(self) -> None:
        if self._h >= 0:
            self._lib.csv_close(self._h)
            self._h = -1
