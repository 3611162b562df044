"""Research model stack (TPU twins of `research/modeling/`)."""

from generative_recommenders_tpu.models.sequential import (
    ModelConfig,
    SequentialRecommender,
)

__all__ = ["ModelConfig", "SequentialRecommender"]
