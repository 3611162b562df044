"""RAILS: retrieval with learned similarities (MoL) —
TPU twin of `research/rails/` (similarities + indexing)."""

from generative_recommenders_tpu.models.rails.layers import GeGLU, SwiGLU
from generative_recommenders_tpu.models.rails.mol import (
    MoLConfig,
    MoLSimilarity,
    load_balancing_mi_loss,
    softmax_dropout_combiner,
)

__all__ = [
    "GeGLU",
    "SwiGLU",
    "MoLConfig",
    "MoLSimilarity",
    "load_balancing_mi_loss",
    "softmax_dropout_combiner",
]
