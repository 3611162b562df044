"""Multi-host initialization.

TPU twin of the reference's process-group bootstrap (`main.py:54-85`
mp.spawn + `research/trainer/train.py:73-79` NCCL init_process_group with
MASTER_ADDR/PORT env): on TPU pods each host runs one process and calls
`jax.distributed.initialize()`; the global device mesh then spans all hosts
and XLA routes collectives over ICI (intra-slice) / DCN (across slices).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent multi-host init. On Cloud TPU the arguments are inferred
    from the environment; elsewhere pass them explicitly (the reference's
    MASTER_ADDR/MASTER_PORT/WORLD_SIZE analogues)."""
    # do NOT call jax.process_count() here — it initializes the backend,
    # after which jax.distributed.initialize is impossible
    already = bool(os.environ.get("JAX_DIST_INITIALIZED"))
    try:  # private API; best-effort probe only
        from jax._src import distributed as _dist

        already = already or (
            getattr(_dist.global_state, "client", None) is not None
        )
    except Exception:
        pass
    if already:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        os.environ["JAX_DIST_INITIALIZED"] = "1"
        logger.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except Exception as e:  # single-host fallback
        logger.info("single-host mode (%s)", e)


def host_batch_shard() -> tuple:
    """(num_shards, shard_index) for host-side data sharding — the
    DistributedSampler rank/world_size analogue."""
    return jax.process_count(), jax.process_index()
