"""TensorBoard logging.

TPU twin of the reference's observability: rank-0 SummaryWriter
(`research/trainer/train.py:294-299`, scalars at :402-427, eval metrics via
`add_to_summary_writer`, `research/data/eval.py:254-264`) and the torchrec
MetricsLogger TB output (`dlrm_v3/utils.py:114-238`). Uses
torch.utils.tensorboard (torch-cpu is available); no-ops if construction
fails so headless runs never crash on logging.
"""

from __future__ import annotations

import logging
from typing import Dict, Mapping, Optional

logger = logging.getLogger(__name__)


class SummaryLogger:
    def __init__(self, log_dir: Optional[str]) -> None:
        self._writer = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir=log_dir)
                logger.info("tensorboard -> %s", log_dir)
            except Exception as e:  # pragma: no cover
                logger.warning("tensorboard disabled: %s", e)

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    def scalars(self, metrics: Mapping[str, float], step: int, prefix: str = "") -> None:
        for k, v in metrics.items():
            if isinstance(v, (int, float)) and k != "epoch":
                self.scalar(f"{prefix}{k}", v, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
