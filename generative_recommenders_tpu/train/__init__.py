"""Training/eval loops and metrics (research + DLRM-v3 stacks)."""

from generative_recommenders_tpu.train.train_loop import (
    ResearchTrainer,
    TrainConfig,
    train_loop,
)

__all__ = ["ResearchTrainer", "TrainConfig", "train_loop"]
