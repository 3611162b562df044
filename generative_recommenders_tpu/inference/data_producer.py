"""Query batchers feeding the serving harness.

TPU twin of `dlrm_v3/inference/data_producer.py:39-94`
(SingleThreadDataProducer / MultiThreadDataProducer — per-thread CUDA
streams there; here worker threads feed the single TPU through JAX's
async dispatch) and the `Runner.enqueue` batching logic
(`dlrm_v3/inference/main.py:93-164`).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, List, Optional, Tuple


class SingleThreadDataProducer:
    """Synchronous: run the prediction inline on enqueue."""

    def __init__(self, predict_fn: Callable[[Any], Any]) -> None:
        self._predict = predict_fn

    def enqueue(self, query_id: int, sample: Any, on_done) -> None:
        on_done(query_id, self._predict(sample))

    def shutdown(self) -> None:
        pass


class MultiThreadDataProducer:
    """N worker threads pulling from a queue (`data_producer.py:55-94`)."""

    def __init__(
        self, predict_fn: Callable[[Any], Any], num_threads: int = 2
    ) -> None:
        self._predict = predict_fn
        self._q: "queue.Queue" = queue.Queue()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_threads)
        ]
        for t in self._threads:
            t.start()

    def _worker(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            query_id, sample, on_done = item
            on_done(query_id, self._predict(sample))

    def enqueue(self, query_id: int, sample: Any, on_done) -> None:
        self._q.put((query_id, sample, on_done))

    def shutdown(self) -> None:
        for _ in self._threads:
            self._q.put(None)
        for t in self._threads:
            t.join()
