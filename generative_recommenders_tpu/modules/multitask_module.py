"""Multitask prediction head (production stack).

TPU twin of `modules/multitask_module.py:30-277`: T tasks (binary
classification decoded from an action bitmask / MSE regression on watchtime)
predicted from user_emb * item_emb through an MLP; per-task-type pred/loss
slicing; `causal_multitask_weights` loss scaling.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.modules.mlp import SwishLayerNorm


class MultitaskTaskType(enum.IntEnum):
    BINARY_CLASSIFICATION = 0
    REGRESSION = 1


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    task_name: str
    task_weight: int
    task_type: MultitaskTaskType


def get_supervision_labels_and_weights(
    supervision_bitmasks: jax.Array,  # int[B, M] candidate action bitmasks
    watchtime_sequence: jax.Array,  # [B, M]
    task_configs: Tuple[TaskConfig, ...],
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """`modules/dlrm_hstu.py:100-116`."""
    labels: Dict[str, jax.Array] = {}
    weights: Dict[str, jax.Array] = {}
    for task in task_configs:
        if task.task_type == MultitaskTaskType.REGRESSION:
            labels[task.task_name] = watchtime_sequence.astype(jnp.float32)
        elif task.task_type == MultitaskTaskType.BINARY_CLASSIFICATION:
            labels[task.task_name] = (
                jnp.bitwise_and(
                    supervision_bitmasks.astype(jnp.int32), task.task_weight
                )
                > 0
            ).astype(jnp.float32)
        else:
            raise ValueError(f"Unsupported task type {task.task_type}")
    return labels, weights


class DefaultMultitaskModule(nn.Module):
    """`multitask_module.py:194-277`. Operates on [B, M, D] candidate
    embeddings with a [B, M] validity mask (padded-dense analogue of the
    jagged (L, D) layout)."""

    task_configs: Tuple[TaskConfig, ...]
    embedding_dim: int
    causal_multitask_weights: float
    prediction_hidden_dim: int = 512

    def setup(self) -> None:
        assert len(self.task_configs) > 0
        assert list(self.task_configs) == sorted(
            self.task_configs, key=lambda t: t.task_type
        ), "task_configs must be sorted by task_type"
        offsets = [0] * (len(MultitaskTaskType) + 1)
        for t in self.task_configs:
            offsets[t.task_type + 1] += 1
        for i in range(1, len(offsets)):
            offsets[i] += offsets[i - 1]
        self._task_offsets = tuple(offsets)
        self._fc1 = nn.Dense(
            self.prediction_hidden_dim,
            kernel_init=nn.initializers.xavier_normal(),
            name="pred_fc1",
        )
        self._sln = SwishLayerNorm(self.prediction_hidden_dim, name="pred_sln")
        self._fc2 = nn.Dense(
            len(self.task_configs),
            kernel_init=nn.initializers.xavier_normal(),
            name="pred_fc2",
        )

    def __call__(
        self,
        encoded_user_embeddings: jax.Array,  # [B, M, D]
        item_embeddings: jax.Array,  # [B, M, D]
        supervision_labels: Dict[str, jax.Array],  # each [B, M]
        supervision_weights: Dict[str, jax.Array],
        candidate_valid_mask: jax.Array,  # bool[B, M]
        compute_losses: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array], Optional[jax.Array]]:
        """Returns (preds [T, B, M], labels, weights, losses [T])."""
        logits = self._fc2(
            self._sln(self._fc1(encoded_user_embeddings * item_embeddings))
        )  # [B, M, T]
        logits = jnp.moveaxis(logits, -1, 0).astype(jnp.float32)  # [T, B, M]
        o = self._task_offsets
        n_cls = o[MultitaskTaskType.BINARY_CLASSIFICATION + 1]
        preds = jnp.concatenate(
            [jax.nn.sigmoid(logits[:n_cls]), logits[n_cls:]], axis=0
        )
        if not compute_losses:
            return preds, None, None, None

        labels = jnp.stack(
            [supervision_labels[t.task_name] for t in self.task_configs], axis=0
        )  # [T, B, M]
        default_w = candidate_valid_mask.astype(jnp.float32)[None]
        weights = jnp.stack(
            [
                supervision_weights.get(
                    t.task_name, candidate_valid_mask.astype(jnp.float32)
                )
                for t in self.task_configs
            ],
            axis=0,
        ) * default_w  # invalid candidates never contribute
        # losses in fp32 (`multitask_module.py:252-262`)
        from generative_recommenders_tpu.models.losses import _bce_with_logits

        bce = _bce_with_logits(logits, labels)
        mse = jnp.square(logits - labels)
        per_elem = jnp.concatenate([bce[:n_cls], mse[n_cls:]], axis=0) * weights
        T = len(self.task_configs)
        per_task = per_elem.reshape(T, -1).sum(-1) / jnp.maximum(
            weights.reshape(T, -1).sum(-1), 1.0
        )
        losses = per_task * self.causal_multitask_weights
        return preds, labels, weights, losses
