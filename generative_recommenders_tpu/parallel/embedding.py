"""Row-sharded embedding engine with an all-to-all id/vector exchange.

The torchrec-DMP replacement (`dlrm_v3/train/utils.py:209-268`, SURVEY.md
§2.3): torchrec routes ids to the owning rank with an all-to-all, looks up
locally, and returns the vectors with a reverse all-to-all; RowWiseAdagrad
is fused into the backward. This module is the TPU-native twin:

  topology — the table is row-sharded ``P("model", None)``; the batch is
  sharded over BOTH mesh axes ``P(("data", "model"))`` so every device is a
  data shard (torchrec's 1-rank-per-GPU layout on a 2-D mesh). Each device
  therefore arrives at the lookup with its *own* ids — nothing is
  replicated, the dense tower never duplicates compute across the model
  axis, and per-device exchange volume is O(B·N·D / n_devices).

  lookup (inside ``shard_map`` over the "model" axis) —
    1. sort the device's flat ids by owning shard (stable argsort),
    2. exchange ids to owners: ``jax.lax.ragged_all_to_all`` (TPU; exact
       variable sizes, the moral twin of NCCL's variable all-to-all used by
       torchrec) or a fixed-capacity ``jax.lax.all_to_all`` (CPU fallback —
       XLA:CPU has no ragged-all-to-all thunk),
    3. local ``jnp.take`` on the shard,
    4. reverse exchange of the vectors, unsort.
  The op carries a ``jax.custom_vjp``: the backward routes the output
  cotangents to the owning shards through the same exchange and
  scatter-adds them into a shard-local dense gradient — each shard only
  ever receives gradients for rows it owns, so the row-wise-Adagrad update
  that follows is shard-local (the in-backward fused sparse update).

  optimizer — `rowwise_adagrad_update` applies the torchrec RowWiseAdagrad
  rule (per-row accumulator += mean(g²); row lr = lr/(√acc+eps)) directly
  on the sharded table.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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


# --------------------------------------------------------------------------
# routing math shared by the forward and backward exchanges


def _routing(flat_ids: jax.Array, nm: int, rows_local: int):
    """Sorts ids by owner shard; returns everything both exchange
    directions need. All shapes static; runs per-device inside shard_map."""
    owner = (flat_ids // rows_local).astype(jnp.int32)
    order = jnp.argsort(owner, stable=True)
    inv_order = jnp.argsort(order)
    sorted_ids = flat_ids[order]
    sorted_owner = owner[order]
    send_counts = jnp.zeros((nm,), jnp.int32).at[owner].add(1)
    # M[s, d] = how many ids source s sends to owner d (the full exchange
    # matrix — every participant needs it to agree on buffer offsets)
    M = jax.lax.all_gather(send_counts, MODEL_AXIS)
    recv_counts = M[:, jax.lax.axis_index(MODEL_AXIS)]
    send_off = _excl_cumsum(send_counts)
    recv_off = _excl_cumsum(recv_counts)
    return (
        sorted_ids,
        sorted_owner,
        order,
        inv_order,
        send_counts,
        recv_counts,
        send_off,
        recv_off,
        M,
    )


def _excl_cumsum(x: jax.Array) -> jax.Array:
    return jnp.concatenate(
        [jnp.zeros((1,), x.dtype), jnp.cumsum(x)[:-1]]
    ).astype(jnp.int32)


def _exchange_to_owners_ragged(payloads, sorted_owner, send_counts,
                               recv_counts, send_off, recv_off, M, L):
    """Sends sorted payload slices to their owner shards; received layout is
    concatenated by source rank at ``recv_off``. Returns (received payloads,
    valid mask [L])."""
    j = jax.lax.axis_index(MODEL_AXIS)
    # offset in receiver d's buffer for MY slice = Σ_{s<me} M[s, d]
    csum = jnp.cumsum(M, axis=0)
    out_offsets = jnp.concatenate(
        [jnp.zeros((1, M.shape[1]), M.dtype), csum[:-1]], axis=0
    )[j].astype(jnp.int32)
    outs = []
    for p in payloads:
        buf_shape = (L,) + p.shape[1:]
        buf = jnp.zeros(buf_shape, p.dtype)
        outs.append(
            jax.lax.ragged_all_to_all(
                p, buf, send_off, send_counts.astype(jnp.int32),
                out_offsets, recv_counts.astype(jnp.int32),
                axis_name=MODEL_AXIS,
            )
        )
    valid = jnp.arange(L, dtype=jnp.int32) < jnp.sum(recv_counts)
    return outs, valid


def _exchange_from_owners_ragged(payloads, send_counts, recv_counts,
                                 send_off, recv_off, M, chunk):
    """Reverse direction: owner sends its computed slices back to the
    requesters; lands directly in the requester's sorted layout."""
    j = jax.lax.axis_index(MODEL_AXIS)
    # offset in requester i's sorted buffer for owner me = Σ_{d<me} M[i, d]
    csum = jnp.cumsum(M, axis=1)
    out_offsets = jnp.concatenate(
        [jnp.zeros((M.shape[0], 1), M.dtype), csum[:, :-1]], axis=1
    )[:, j].astype(jnp.int32)
    outs = []
    for p in payloads:
        buf = jnp.zeros((chunk,) + p.shape[1:], p.dtype)
        outs.append(
            jax.lax.ragged_all_to_all(
                p, buf, recv_off, recv_counts.astype(jnp.int32),
                out_offsets, send_counts.astype(jnp.int32),
                axis_name=MODEL_AXIS,
            )
        )
    return outs


def _bucketize_dense(payloads, sorted_owner, send_off, nm, chunk, fill):
    """Scatters sorted payloads into a [nm, chunk] per-destination layout
    (capacity = chunk per destination — always enough since a device sends
    at most its whole chunk)."""
    pos = jnp.arange(chunk, dtype=jnp.int32) - send_off[sorted_owner]
    slot = sorted_owner * chunk + pos
    outs = []
    for p, f in zip(payloads, fill):
        buf = jnp.full((nm * chunk,) + p.shape[1:], f, p.dtype)
        buf = buf.at[slot].set(p)
        outs.append(buf.reshape((nm, chunk) + p.shape[1:]))
    return outs


def _unbucketize_dense(payloads, sorted_owner, send_off, chunk):
    """Gathers the [nm, chunk] reverse-exchange result back into the
    requester's sorted layout."""
    pos = jnp.arange(chunk, dtype=jnp.int32) - send_off[sorted_owner]
    return [p[sorted_owner, pos] for p in payloads]


def _resolve_impl(mesh: Mesh, impl: str) -> str:
    if impl != "auto":
        return impl
    dev = mesh.devices.flat[0]
    return "ragged" if dev.platform == "tpu" else "dense"


# --------------------------------------------------------------------------
# the lookup op (custom_vjp, cached per (mesh, impl, table geometry))


@functools.lru_cache(maxsize=64)
def _make_lookup(mesh: Mesh, impl: str, rows: int, dim: int):
    nm = mesh.shape[MODEL_AXIS]
    rows_local = rows // nm
    batch_spec = P((DATA_AXIS, MODEL_AXIS), None)

    def _fwd_local(local_table, local_ids):
        """Per-device body: ids [b, N] (this device's own rows)."""
        b, N = local_ids.shape
        L = b * N
        flat = local_ids.reshape(-1).astype(jnp.int32)
        (sorted_ids, sorted_owner, order, inv_order, send_counts,
         recv_counts, send_off, recv_off, M) = _routing(flat, nm, rows_local)
        j = jax.lax.axis_index(MODEL_AXIS)
        if impl == "ragged":
            (recv_ids,), valid = _exchange_to_owners_ragged(
                (sorted_ids,), sorted_owner, send_counts, recv_counts,
                send_off, recv_off, M, L * nm,
            )
            local_idx = recv_ids - j * rows_local
            hit = valid & (local_idx >= 0) & (local_idx < rows_local)
            vecs = jnp.take(
                local_table, jnp.clip(local_idx, 0, rows_local - 1), axis=0
            )
            vecs = jnp.where(hit[:, None], vecs, 0)
            (sorted_vecs,) = _exchange_from_owners_ragged(
                (vecs,), send_counts, recv_counts, send_off, recv_off, M, L,
            )
        else:  # dense fixed-capacity all_to_all (CPU / tests)
            (send_ids,) = _bucketize_dense(
                (sorted_ids,), sorted_owner, send_off, nm, L, fill=(rows,)
            )
            recv_ids = jax.lax.all_to_all(
                send_ids, MODEL_AXIS, split_axis=0, concat_axis=0, tiled=True
            )
            local_idx = recv_ids - j * rows_local
            hit = (local_idx >= 0) & (local_idx < rows_local)
            vecs = jnp.take(
                local_table, jnp.clip(local_idx, 0, rows_local - 1), axis=0
            )
            vecs = jnp.where(hit[..., None], vecs, 0)
            back = jax.lax.all_to_all(
                vecs, MODEL_AXIS, split_axis=0, concat_axis=0, tiled=True
            ).reshape(nm, L, dim)
            (sorted_vecs,) = _unbucketize_dense(
                (back,), sorted_owner, send_off, L
            )
        out = sorted_vecs[inv_order]
        return out.reshape(b, N, dim)

    def _bwd_local(local_ids, local_g):
        """Per-device body: route cotangents to owner shards, scatter-add
        into the local table-shard gradient."""
        b, N = local_ids.shape
        L = b * N
        flat = local_ids.reshape(-1).astype(jnp.int32)
        g = local_g.reshape(L, dim)
        (sorted_ids, sorted_owner, order, _inv, send_counts,
         recv_counts, send_off, recv_off, M) = _routing(flat, nm, rows_local)
        sorted_g = g[order]
        j = jax.lax.axis_index(MODEL_AXIS)
        if impl == "ragged":
            (recv_ids, recv_g), valid = _exchange_to_owners_ragged(
                (sorted_ids, sorted_g), sorted_owner, send_counts,
                recv_counts, send_off, recv_off, M, L * nm,
            )
            local_idx = recv_ids - j * rows_local
            hit = valid & (local_idx >= 0) & (local_idx < rows_local)
        else:
            send_ids, send_g = _bucketize_dense(
                (sorted_ids, sorted_g), sorted_owner, send_off, nm, L,
                fill=(rows, 0),
            )
            recv_ids = jax.lax.all_to_all(
                send_ids, MODEL_AXIS, split_axis=0, concat_axis=0, tiled=True
            )
            recv_g = jax.lax.all_to_all(
                send_g, MODEL_AXIS, split_axis=0, concat_axis=0, tiled=True
            ).reshape(nm * L, dim)
            recv_ids = recv_ids.reshape(-1)
            local_idx = recv_ids - j * rows_local
            hit = (local_idx >= 0) & (local_idx < rows_local)
        safe = jnp.where(hit, local_idx, rows_local)  # row rows_local = bin
        d_local = (
            jnp.zeros((rows_local + 1, dim), local_g.dtype)
            .at[safe]
            .add(jnp.where(hit[:, None], recv_g.reshape(-1, dim), 0))[
                :rows_local
            ]
        )
        # contributions from the other data-parallel rows of the batch
        return jax.lax.psum(d_local, DATA_AXIS)

    fwd_sharded = shard_map(
        _fwd_local,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), batch_spec),
        out_specs=P((DATA_AXIS, MODEL_AXIS), None, None),
        check_vma=False,
    )
    bwd_sharded = shard_map(
        _bwd_local,
        mesh=mesh,
        in_specs=(batch_spec, P((DATA_AXIS, MODEL_AXIS), None, None)),
        out_specs=P(MODEL_AXIS, None),
        check_vma=False,
    )

    @jax.custom_vjp
    def lookup(table, ids):
        return fwd_sharded(table, ids)

    def lookup_fwd(table, ids):
        return fwd_sharded(table, ids), ids

    def lookup_bwd(ids, g):
        d_table = bwd_sharded(ids, g)
        return d_table, np.zeros(ids.shape, dtype=jax.dtypes.float0)

    lookup.grad_exchange = bwd_sharded  # direct access for sparse updates
    lookup.defvjp(lookup_fwd, lookup_bwd)
    return lookup


def sharded_lookup(
    table: jax.Array,
    ids: jax.Array,
    mesh: Mesh,
    impl: str = "auto",
) -> jax.Array:
    """ids i32[B, N] (batch sharded over (data, model)) → f32[B, N, D].

    Differentiable: the backward routes cotangents to the owning shards and
    scatter-adds, so each shard receives only gradients for rows it owns
    (torchrec in-backward-update comm pattern).
    """
    nm = mesh.shape[MODEL_AXIS]
    squeeze = ids.ndim == 1
    if squeeze:
        ids = ids[:, None]
    if nm == 1:
        out = jnp.take(table, ids.astype(jnp.int32), axis=0)
        return out[:, 0] if squeeze else out
    rows, dim = table.shape
    if rows % nm != 0:
        # param_shardings leaves non-divisible tables replicated (see
        # `parallel/sharding.py:_row_shardable`); a local take is then the
        # correct lookup. Size vocabs with pad_vocab_to to get sharding.
        out = jnp.take(table, ids.astype(jnp.int32), axis=0)
        return out[:, 0] if squeeze else out
    fn = _make_lookup(mesh, _resolve_impl(mesh, impl), rows, dim)
    out = fn(table, ids)
    return out[:, 0] if squeeze else out


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
    Duplicate ids accumulate, matching dense scatter-add semantics. The
    gradient routing calls the lookup's backward exchange DIRECTLY — one
    owner-routed all-to-all, no wasted forward — and the update itself is
    shard-local.
    """
    nm = mesh.shape[MODEL_AXIS]
    rows, dim = state.table.shape
    if nm == 1 or rows % nm != 0:
        flat_ids = ids.reshape(-1).astype(jnp.int32)
        g_table = (
            jnp.zeros((rows, dim), grads.dtype)
            .at[flat_ids]
            .add(grads.reshape(-1, dim))
        )
    else:
        fn = _make_lookup(mesh, _resolve_impl(mesh, "auto"), rows, dim)
        g_table = fn.grad_exchange(ids, grads)
    g2 = jnp.mean(g_table * g_table, axis=1)
    new_acc = state.accumulator + g2
    row_lr = lr / (jnp.sqrt(new_acc) + eps)
    new_table = state.table - row_lr[:, None] * g_table
    return ShardedEmbeddingState(new_table, new_acc)


def lookup_and_grad_fn(mesh: Mesh):
    """Convenience returning (lookup, sparse_update) closures bound to mesh."""
    return (
        lambda table, ids: sharded_lookup(table, ids, mesh),
        lambda state, ids, grads, lr: rowwise_adagrad_update(
            state, ids, grads, mesh, lr=lr
        ),
    )
