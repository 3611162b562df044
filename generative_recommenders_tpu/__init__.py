"""generative_recommenders_tpu: a TPU-native (JAX / XLA / Pallas / pjit) generative
recommender framework with the capabilities of facebookresearch/generative-recommenders.

Layer map (mirrors the reference's two stacks sharing one kernel library):

  ops/        jagged-tensor library + HSTU attention (pure-jnp reference spec and
              Pallas TPU kernels), layer norms, positional ops.
  models/     research stack: HSTU / SASRec encoders, input preprocessors, output
              postprocessors, similarity modules (DotProduct / MoL), losses, samplers.
  modules/    production stack: STU layers, HSTUTransducer, DlrmHSTU multitask ranker.
  data/       dataset loaders (sasrec_format.csv compatible), synthetic generators.
  indexing/   candidate index + brute-force MIPS / MoL top-k retrieval.
  train/      jitted train/eval loops, metrics, checkpointing.
  parallel/   device mesh helpers, row-sharded embedding engine (torchrec-DMP analogue).
  inference/  KV-cache M-FALCON incremental decode + serving harness.

The compute path is JAX/XLA/Pallas end-to-end; nothing here depends on torch.
"""

__version__ = "0.1.0"
