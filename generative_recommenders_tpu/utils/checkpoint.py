"""Checkpoint save/restore (Orbax-backed).

TPU twin of the reference's two checkpoint schemes:
  * research: monolithic torch.save of {epoch, model, optimizer}
    (`research/trainer/train.py:507-535`) — here one Orbax StandardSave of
    the train-state pytree;
  * dlrm_v3: sharded embedding tensors via torch.distributed.checkpoint +
    rank-0 dense torch.save (`dlrm_v3/checkpoint.py:71-160`) — Orbax handles
    sharded (NamedSharding) arrays natively, so the sparse/dense split
    disappears: each leaf is written with its sharding and restored to the
    same (or a new) mesh layout.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(path: str, state: Any, step: int) -> str:
    """Writes ``state`` (any pytree of arrays) under ``path/<step>``."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        with ocp.StandardCheckpointer() as ckptr:
            ckpt_path = os.path.join(path, str(step))
            ckptr.save(ckpt_path, state)
        return ckpt_path
    # fallback: npz of flattened leaves (CPU-only environments)
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    ckpt_path = os.path.join(path, f"{step}.npz")
    np.savez(
        ckpt_path,
        treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    return ckpt_path


def latest_step(path: str) -> Optional[int]:
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    steps = []
    for d in os.listdir(path):
        name = d[:-4] if d.endswith(".npz") else d
        if name.isdigit():
            steps.append(int(name))
    return max(steps) if steps else None


def restore_checkpoint(path: str, target: Any, step: Optional[int] = None) -> Any:
    """Restores into the structure/shardings of ``target`` (a pytree of
    arrays or jax.ShapeDtypeStructs with shardings)."""
    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    if _HAS_ORBAX:
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(os.path.join(path, str(step)), target)
    data = np.load(os.path.join(path, f"{step}.npz"))
    leaves, treedef = jax.tree_util.tree_flatten(target)
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, restored)
