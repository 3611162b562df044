"""Distributed layer: mesh, sharding rules, row-sharded embedding engine,
sharded trainer (SURVEY.md §2.3 TPU-native mapping)."""

from generative_recommenders_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
)
from generative_recommenders_tpu.parallel.embedding import (
    ShardedEmbeddingState,
    create_sharded_embedding,
    rowwise_adagrad_update,
    sharded_lookup,
)
from generative_recommenders_tpu.parallel.train import DistributedTrainer

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "ShardedEmbeddingState",
    "create_sharded_embedding",
    "rowwise_adagrad_update",
    "sharded_lookup",
    "DistributedTrainer",
]
