"""Sharding-rule construction for params / optimizer state / batches.

Replaces the reference's two parallelism mechanisms (SURVEY.md §2.3):
  * DDP over dense params (`research/trainer/train.py:269`)  → params
    replicated, batch sharded over the "data" axis; grad all-reduce is
    inserted by XLA.
  * torchrec DistributedModelParallel row-sharding of embedding tables
    (`dlrm_v3/train/utils.py:230-233`) → the item-embedding table (and its
    optimizer moments) get `P("model", None)` row sharding.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from generative_recommenders_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Param-path fragments that mark row-shardable embedding tables.
_TABLE_PATH_KEYS = ("embedding_module", "embedding_tables", "item_embedding")


def _path_str(path: Any) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
        for p in path
    )


def is_table_path(path: Any) -> bool:
    s = _path_str(path)
    return any(k in s for k in _TABLE_PATH_KEYS)


def _row_shardable(mesh: Mesh, leaf: Any) -> bool:
    n = mesh.shape[MODEL_AXIS]
    return (
        getattr(leaf, "ndim", 0) == 2
        and leaf.shape[0] % n == 0
    )


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Embedding tables → row-sharded over "model"; everything else
    replicated (the dense tower is data-parallel). Tables whose row count
    doesn't divide the model axis stay replicated (size the vocab padding to
    the mesh — `pad_vocab_to` — to get sharding)."""
    replicated = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(MODEL_AXIS, None))

    def rule(path, leaf):
        if is_table_path(path) and _row_shardable(mesh, leaf):
            return rows
        return replicated

    return jax.tree_util.tree_map_with_path(rule, params)


def pad_vocab_to(num_items: int, mesh_model_size: int) -> int:
    """Smallest vocab (incl. the +1 padding row) divisible by the model axis."""
    rows = num_items + 1
    return ((rows + mesh_model_size - 1) // mesh_model_size) * mesh_model_size - 1


def like_shardings(mesh: Mesh, tree: Any, table_shapes: set) -> Any:
    """Shards any params-shaped satellite tree (e.g. optax moments) by shape
    matching: leaves whose shape equals a sharded table's shape get the same
    row sharding. Safe because table shapes (num_items+1, D) are distinctive."""
    replicated = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(MODEL_AXIS, None))

    row_counts = {s[0] for s in table_shapes}
    rows_1d = NamedSharding(mesh, P(MODEL_AXIS))
    n = mesh.shape[MODEL_AXIS]

    def rule(leaf):
        if (
            _row_shardable(mesh, leaf)
            and tuple(leaf.shape) in table_shapes
        ):
            return rows
        # 1-D satellites (e.g. row-wise Adagrad accumulators) ride along
        if (
            getattr(leaf, "ndim", 0) == 1
            and leaf.shape[0] in row_counts
            and leaf.shape[0] % n == 0
        ):
            return rows_1d
        return replicated

    return jax.tree_util.tree_map(rule, tree)


def table_shapes_of(params: Any) -> set:
    shapes = set()

    def visit(path, leaf):
        if is_table_path(path) and getattr(leaf, "ndim", 0) == 2:
            shapes.add(tuple(leaf.shape))
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return shapes


def batch_shardings(mesh: Mesh, batch: Any) -> Any:
    """Every batch leaf sharded on dim 0 over BOTH mesh axes (replaces
    DistributedSampler row sharding, `research/trainer/data_loader.py:38-46`).

    Sharding the batch over (data × model) makes every device a data shard —
    torchrec's 1-rank-per-GPU topology — so dense-tower compute is never
    replicated across the model axis and the embedding all-to-all exchange
    (`parallel/embedding.py`) runs with per-device ids."""
    s = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
    return jax.tree_util.tree_map(lambda _: s, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
