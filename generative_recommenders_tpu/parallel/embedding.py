"""Explicit row-sharded embedding engine (torchrec-DMP analogue).

The reference shards big item tables with torchrec DistributedModelParallel:
an all-to-all routes ids to the owning rank, local lookup, reverse all-to-all
returns vectors, and RowWiseAdagrad is fused into the backward
(`dlrm_v3/train/utils.py:190-268`, SURVEY.md §2.3). On TPU we keep the table
row-sharded `P("model", None)` and do the exchange with XLA collectives
inside `shard_map`:

  lookup: every shard gathers its local hits (ids outside the local row
  range contribute zeros) and a `psum` over the "model" axis combines them —
  one all-reduce of [B*, D] activations over ICI, the moral twin of the
  result all-to-all. The op is linear in the table, so autodiff produces the
  correct (sharded) scatter-add gradient for free.

  optimizer: `rowwise_adagrad_update` applies the torchrec RowWiseAdagrad
  rule (per-row accumulator += mean(g²); row lr = lr/(√acc+eps)) directly on
  the sharded table from the per-occurrence gradient — the in-backward fused
  sparse update, without densifying beyond one local-table-sized buffer.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from generative_recommenders_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


class ShardedEmbeddingState(NamedTuple):
    """Table + RowWiseAdagrad accumulator, both row-sharded P("model", None)
    / P("model") — mirrors torchrec's sharded table + fused optimizer state."""

    table: jax.Array  # f32[num_rows, D]
    accumulator: jax.Array  # f32[num_rows]


def create_sharded_embedding(
    rng: jax.Array,
    num_rows: int,
    dim: int,
    mesh: Mesh,
    stddev: float = 0.02,
) -> ShardedEmbeddingState:
    n_shards = mesh.shape[MODEL_AXIS]
    if num_rows % n_shards != 0:
        raise ValueError(
            f"num_rows {num_rows} must be divisible by model shards {n_shards}"
        )
    table = jax.jit(
        lambda r: jax.random.truncated_normal(r, -2.0, 2.0, (num_rows, dim))
        * stddev,
        out_shardings=NamedSharding(mesh, P(MODEL_AXIS, None)),
    )(rng)
    acc = jax.jit(
        lambda: jnp.zeros((num_rows,), jnp.float32),
        out_shardings=NamedSharding(mesh, P(MODEL_AXIS)),
    )()
    return ShardedEmbeddingState(table, acc)


def sharded_lookup(
    table: jax.Array, ids: jax.Array, mesh: Mesh
) -> jax.Array:
    """ids i32[B, N] (data-sharded) → vectors f32[B, N, D].

    Differentiable; the cotangent lands on the sharded table as a local
    scatter-add (each shard only receives gradients for rows it owns).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None),
    )
    def _lookup(local_table: jax.Array, local_ids: jax.Array) -> jax.Array:
        shard = jax.lax.axis_index(MODEL_AXIS)
        rows = local_table.shape[0]
        local_idx = local_ids - shard * rows
        hit = (local_idx >= 0) & (local_idx < rows)
        got = jnp.take(
            local_table, jnp.clip(local_idx, 0, rows - 1), axis=0
        )
        got = jnp.where(hit[..., None], got, 0.0)
        return jax.lax.psum(got, MODEL_AXIS)

    return _lookup(table, ids)


def rowwise_adagrad_update(
    state: ShardedEmbeddingState,
    ids: jax.Array,
    grads: jax.Array,
    mesh: Mesh,
    lr: float = 0.01,
    eps: float = 1e-8,
) -> ShardedEmbeddingState:
    """Sparse RowWiseAdagrad on the sharded table.

    ids i32[B, N], grads f32[B, N, D] — per-occurrence cotangents (as
    produced by differentiating `sharded_lookup`'s consumer wrt its output).
    Duplicate ids accumulate, matching dense scatter-add semantics.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None),
            P(MODEL_AXIS),
            P(DATA_AXIS, None),
            P(DATA_AXIS, None, None),
        ),
        out_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS)),
    )
    def _update(local_table, local_acc, local_ids, local_grads):
        shard = jax.lax.axis_index(MODEL_AXIS)
        rows = local_table.shape[0]
        D = local_table.shape[1]
        flat_ids = local_ids.reshape(-1)
        flat_g = local_grads.reshape(-1, D)
        local_idx = flat_ids - shard * rows
        hit = (local_idx >= 0) & (local_idx < rows)
        safe_idx = jnp.where(hit, local_idx, rows)  # row `rows` = scratch
        g_table = jnp.zeros((rows + 1, D), flat_g.dtype).at[safe_idx].add(
            jnp.where(hit[:, None], flat_g, 0.0)
        )[:rows]
        # every shard owns a full copy of the data-sharded grads? No: each
        # data shard only saw its slice, so sum partial scatter-adds.
        g_table = jax.lax.psum(g_table, DATA_AXIS)
        g2 = jnp.mean(g_table * g_table, axis=1)  # torchrec row-wise moment
        new_acc = local_acc + g2
        row_lr = lr / (jnp.sqrt(new_acc) + eps)
        new_table = local_table - row_lr[:, None] * g_table
        return new_table, new_acc

    table, acc = _update(state.table, state.accumulator, ids, grads)
    return ShardedEmbeddingState(table, acc)


def lookup_and_grad_fn(mesh: Mesh):
    """Convenience returning (lookup, sparse_update) closures bound to mesh."""
    return (
        lambda table, ids: sharded_lookup(table, ids, mesh),
        lambda state, ids, grads, lr: rowwise_adagrad_update(
            state, ids, grads, mesh, lr=lr
        ),
    )
