"""Distributed trainer: the research train/eval steps jitted over a mesh.

TPU twin of the reference's DDP training (`research/trainer/train.py:73-79,
269`: NCCL process group + DistributedDataParallel + DistributedSampler).
Here distribution is purely declarative: the same pure step functions from
`train_loop.ResearchTrainer` are jitted with NamedShardings —
  * batch  → P("data")   (DistributedSampler analogue)
  * dense params → replicated (DDP analogue; grad psum inserted by XLA)
  * embedding table + its optimizer moments → P("model", None)
    (torchrec DistributedModelParallel analogue, `dlrm_v3/train/utils.py:230`)
Metric reductions (`research/data/eval.py:245-251` all_reduce) are jnp.mean
under jit — XLA emits the psum.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from generative_recommenders_tpu.parallel.sharding import (
    batch_shardings,
    like_shardings,
    param_shardings,
    replicated,
    table_shapes_of,
)
from generative_recommenders_tpu.train.train_loop import (
    ResearchTrainer,
    TrainConfig,
)


class DistributedTrainer(ResearchTrainer):
    """ResearchTrainer whose steps run pjit-sharded over ``mesh``."""

    def __init__(
        self, cfg: TrainConfig, all_item_ids: np.ndarray, mesh: Mesh
    ) -> None:
        super().__init__(cfg, all_item_ids)
        self.mesh = mesh
        # Row-sharded item table => route every batch-shaped lookup through
        # the all-to-all exchange (`parallel/embedding.py:sharded_lookup`)
        # instead of jnp.take, whose GSPMD lowering would silently all-gather
        # the table (+AdamW moments) every step. Mirrors the DlrmTrainer
        # binding (`train/dlrm_train.py`); guaranteed by
        # `tests/test_parallel.py::test_research_train_step_no_table_allgather`.
        from generative_recommenders_tpu.parallel.mesh import MODEL_AXIS

        if mesh.shape[MODEL_AXIS] > 1:
            from generative_recommenders_tpu.models.sequential import (
                SequentialRecommender,
            )
            from generative_recommenders_tpu.parallel.embedding import (
                sharded_lookup,
            )

            self._lookup_fn = lambda table, ids: sharded_lookup(
                table, ids, mesh
            )
            self.model = SequentialRecommender(
                cfg.model, lookup_fn=self._lookup_fn
            )
        self._param_sh: Any = None
        self._opt_sh: Any = None
        self._sharded_train_step = None
        self._sharded_encode = None

    # ------------------------------------------------------------------ init
    def init_sharded(self, rng: jax.Array) -> Tuple[Any, Any]:
        """Initializes params + opt state already laid out on the mesh."""
        params_shape = jax.eval_shape(self.init_params, rng)
        self._param_sh = param_shardings(self.mesh, params_shape)
        tshapes = table_shapes_of(params_shape)
        opt_shape = jax.eval_shape(self.tx.init, params_shape)
        self._opt_sh = like_shardings(self.mesh, opt_shape, tshapes)
        params = jax.jit(self.init_params, out_shardings=self._param_sh)(rng)
        opt_state = jax.jit(self.tx.init, out_shardings=self._opt_sh)(params)
        return params, opt_state

    # ------------------------------------------------------------------ steps
    def train_step(
        self,
        params: Any,
        opt_state: Any,
        batch: Dict[str, np.ndarray],
        rng: jax.Array,
    ) -> Tuple[Any, Any, jax.Array]:
        cfg = self.cfg
        if cfg.seq_len_buckets or cfg.runtime_bucketing:
            # same compile-bucket preamble as ResearchTrainer.train_step; the
            # bucket width is computed from the batch at hand, so it is only
            # host-consistent when there is a single process
            if jax.process_count() > 1:
                raise ValueError(
                    "seq_len_buckets/runtime_bucketing are unsupported in "
                    "multi-process training: bucket widths computed from "
                    "host-local batches would diverge across hosts"
                )
            from generative_recommenders_tpu.utils.bucketing import (
                bucket_batch,
            )

            batch = bucket_batch(
                batch, cfg.seq_len_buckets, cfg.runtime_bucketing
            )
        if self._sharded_train_step is None:
            assert self._param_sh is not None, "call init_sharded first"
            rep = replicated(self.mesh)
            self._sharded_train_step = jax.jit(
                self._train_step_impl,
                in_shardings=(
                    self._param_sh,
                    self._opt_sh,
                    batch_shardings(self.mesh, batch),
                    rep,
                ),
                out_shardings=(self._param_sh, self._opt_sh, rep),
                donate_argnums=(0, 1),
            )
        return self._sharded_train_step(params, opt_state, batch, rng)

    def to_global_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Multi-host: assembles each host's local rows into global arrays
        laid out by `batch_shardings` (`jax.make_array_from_process_local_
        data`). Single-process: pass-through. Hosts must feed contiguous
        row shards (`batch_iterator(..., shard_contiguous=True)`) so the
        logical global batch is the single-host one."""
        if jax.process_count() == 1:
            return batch
        sh = batch_shardings(self.mesh, batch)
        return {
            k: jax.make_array_from_process_local_data(sh[k], np.asarray(v))
            for k, v in batch.items()
        }

    def encode_step(
        self, params: Any, batch: Dict[str, np.ndarray], item_embs: jax.Array
    ):
        if self._sharded_encode is None:
            rep = replicated(self.mesh)
            self._sharded_encode = jax.jit(
                self._encode_impl,
                in_shardings=(
                    self._param_sh,
                    batch_shardings(self.mesh, batch),
                    rep,
                ),
                out_shardings=(rep, rep),
            )
        return self._sharded_encode(params, batch, item_embs)


def distributed_train_loop(
    cfg: TrainConfig,
    train_dataset,
    eval_dataset,
    mesh: Optional[Mesh] = None,
    log_every: int = 100,
    max_steps: Optional[int] = None,
):
    """Multi-host research training driver: each host feeds its contiguous
    row shard of every global batch; steps run pjit-sharded over the global
    mesh; eval metrics are averaged across hosts (the DDP + DistributedSampler
    + all_reduce loop of `research/trainer/train.py:306-521`, host-parallel).
    """
    import logging
    import time

    import jax.numpy as jnp

    from generative_recommenders_tpu.data.dataset import batch_iterator
    from generative_recommenders_tpu.parallel.distributed import (
        host_batch_shard,
    )
    from generative_recommenders_tpu.parallel.mesh import make_mesh
    from generative_recommenders_tpu.train.eval_metrics import (
        MetricsAccumulator,
        metrics_from_ranks,
    )

    logger = logging.getLogger(__name__)
    mesh = mesh or make_mesh()
    trainer = DistributedTrainer(cfg, train_dataset.all_item_ids(), mesh)
    rng = jax.random.PRNGKey(cfg.random_seed)
    rng, init_rng = jax.random.split(rng)
    params, opt_state = trainer.init_sharded(init_rng)
    num_shards, shard_index = host_batch_shard()
    assert cfg.local_batch_size % num_shards == 0
    local_bs = cfg.local_batch_size // num_shards

    batch_id = 0
    history = []
    t0 = time.time()
    for epoch in range(cfg.num_epochs):
        for batch in batch_iterator(
            train_dataset, local_bs, shuffle=True,
            seed=cfg.random_seed + epoch,
            num_shards=num_shards, shard_index=shard_index,
            shard_contiguous=True,
        ):
            params, opt_state, loss = trainer.train_step(
                params, opt_state, trainer.to_global_batch(batch),
                jax.random.fold_in(rng, batch_id),
            )
            if batch_id % log_every == 0 and jax.process_index() == 0:
                logger.info(
                    "step %d (epoch %d, %.1fs): loss %.6f",
                    batch_id, epoch, time.time() - t0, float(loss),
                )
            batch_id += 1
            if max_steps is not None and batch_id >= max_steps:
                break
        # host-sharded eval, metrics averaged across hosts
        item_embs = trainer._item_embs(params)
        acc = MetricsAccumulator()
        for i, ebatch in enumerate(
            batch_iterator(
                eval_dataset, local_bs, shuffle=True,
                seed=cfg.random_seed + epoch,
                num_shards=num_shards, shard_index=shard_index,
                shard_contiguous=True,
            )
        ):
            ranks, ratings = trainer.encode_step(
                params, trainer.to_global_batch(ebatch), item_embs
            )
            acc.update(metrics_from_ranks(ranks, ratings))
            if i + 1 >= cfg.partial_eval_num_iters:
                break
        metrics = acc.compute()
        metrics["epoch"] = epoch
        history.append(metrics)
        if jax.process_index() == 0:
            logger.info(
                "eval epoch %d: HR@10 %.4f NDCG@10 %.4f",
                epoch, metrics.get("hr@10", float("nan")),
                metrics.get("ndcg@10", float("nan")),
            )
        if max_steps is not None and batch_id >= max_steps:
            break
    return {"params": params, "opt_state": opt_state, "history": history}
