"""Optimizers for the production stack.

TPU twin of `dlrm_v3/train/utils.py:190-268` (make_optimizer_and_shard):
the reference fuses RowWiseAdagrad into the backward of torchrec's sharded
tables (`apply_optimizer_in_backward`) and runs a dense keyed optimizer for
the rest, unified by CombinedOptimizer. Here the same split is an
`optax.multi_transform`: embedding-table params (path-matched, the same rule
that row-shards them) get row-wise Adagrad; everything else gets the dense
optimizer. Because the table and its accumulator carry the same row
sharding, the update is computed shard-locally — the in-backward fusion
falls out of XLA fusing grad + update into one program.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from generative_recommenders_tpu.parallel.sharding import is_table_path


class RowWiseAdagradState(NamedTuple):
    acc: Any  # per-param: f32[rows] for 2-D params


def rowwise_adagrad(
    learning_rate: float = 0.01, eps: float = 1e-8, initial_acc: float = 0.0
) -> optax.GradientTransformation:
    """Per-row accumulator += mean(g^2, axis=-1); row lr = lr/(sqrt+eps)
    (torchrec RowWiseAdagrad semantics)."""

    def init_fn(params):
        return RowWiseAdagradState(
            acc=jax.tree_util.tree_map(
                lambda p: jnp.full(p.shape[:1], initial_acc, jnp.float32)
                if p.ndim == 2
                else jnp.zeros_like(p),
                params,
            )
        )

    def update_fn(grads, state, params=None):
        def acc_upd(g, a):
            if g.ndim == 2:
                return a + jnp.mean(g * g, axis=1)
            return a + g * g

        def step_upd(g, a):
            if g.ndim == 2:
                return (-learning_rate / (jnp.sqrt(a) + eps))[:, None] * g
            return -learning_rate / (jnp.sqrt(a) + eps) * g

        new_acc = jax.tree_util.tree_map(acc_upd, grads, state.acc)
        updates = jax.tree_util.tree_map(step_upd, grads, new_acc)
        return updates, RowWiseAdagradState(acc=new_acc)

    return optax.GradientTransformation(init_fn, update_fn)


def make_dlrm_optimizer(
    params: Any,
    dense_lr: float = 1e-3,
    sparse_lr: float = 0.01,
    dense_optimizer: str = "adam",
) -> optax.GradientTransformation:
    """Sparse/dense split optimizer (`dlrm_v3/train/utils.py:209-268`)."""

    def label(path, leaf):
        return "sparse" if (is_table_path(path) and leaf.ndim == 2) else "dense"

    labels = jax.tree_util.tree_map_with_path(label, params)
    dense_tx = (
        optax.adam(dense_lr)
        if dense_optimizer == "adam"
        else optax.sgd(dense_lr)
    )
    return optax.multi_transform(
        {"sparse": rowwise_adagrad(sparse_lr), "dense": dense_tx}, labels
    )
