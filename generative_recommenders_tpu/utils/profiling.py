"""Profiling / tracing utilities.

TPU twin of `dlrm_v3/utils.py:53-111` (Profiler: torch.profiler schedule
wait=10/warmup=20/active=N exporting chrome traces) and the
`record_function` markers around hot regions (`modules/stu.py:301-401`).
On TPU: `jax.profiler` traces (Perfetto/XPlane) + named scopes.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)

# named_scope is the record_function analogue; re-export for call sites
named_scope = jax.named_scope


class Profiler:
    """Step-schedule profiler: skips `wait` steps, warms up `warmup` steps,
    traces `active` steps to `log_dir` (`dlrm_v3/utils.py:90-111`)."""

    def __init__(
        self,
        log_dir: str = "/tmp/gr_tpu_trace",
        wait: int = 10,
        warmup: int = 20,
        active: int = 5,
    ) -> None:
        self._log_dir = log_dir
        self._start_step = wait + warmup
        self._stop_step = wait + warmup + active
        self._step = 0
        self._tracing = False

    def step(self) -> None:
        self._step += 1
        if self._step == self._start_step:
            os.makedirs(self._log_dir, exist_ok=True)
            jax.profiler.start_trace(self._log_dir)
            self._tracing = True
            logger.info("profiler: started trace -> %s", self._log_dir)
        elif self._step == self._stop_step and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
            logger.info("profiler: wrote trace to %s", self._log_dir)

    def close(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """One-shot trace context (`jax.profiler.trace` with mkdir)."""
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield
