"""Device-mesh construction for the distributed stack.

TPU-native replacement for the reference's process-group setup
(`research/trainer/train.py:73-79` NCCL init, `dlrm_v3/train/utils.py:72-93`):
instead of one process per accelerator + NCCL, we build a
`jax.sharding.Mesh` with axes ("data", "model") and let pjit/XLA place
collectives on ICI/DCN.

  * "data"  — batch (data-parallel) axis; replaces DDP.
  * "model" — embedding-table row-sharding axis; replaces torchrec
    DistributedModelParallel (`dlrm_v3/train/utils.py:230-233`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Builds a 2-D (data, model) mesh over ``devices``.

    With ``shape=None`` all devices go on the data axis (pure DP), matching
    the reference's default DDP topology; pass e.g. ``(2, 4)`` to row-shard
    embedding tables 4-way inside 2 data replicas.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))
