"""DLRM-v3 training/eval loops over a device mesh.

TPU twin of `dlrm_v3/train/utils.py:320-419` (train_loop / eval_loop) +
`dlrm_v3/train/train_ranker.py`: model build, sparse/dense optimizer split,
sharded (DMP-analogue) tables, metric logging, checkpointing. The reference
spawns one process per GPU; here one process drives the mesh via jit with
NamedShardings.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from generative_recommenders_tpu.modules.dlrm_hstu import (
    DlrmHSTU,
    DlrmHSTUConfig,
    EmbeddingTableConfig,
)
from generative_recommenders_tpu.parallel.embedding import sharded_lookup
from generative_recommenders_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from generative_recommenders_tpu.parallel.optimizers import make_dlrm_optimizer
from generative_recommenders_tpu.parallel.sharding import (
    batch_shardings,
    like_shardings,
    param_shardings,
    replicated,
    table_shapes_of,
)
from generative_recommenders_tpu.train.dlrm_metrics import MetricsLogger
from generative_recommenders_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from generative_recommenders_tpu.utils.profiling import Profiler

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class DlrmTrainConfig:
    batch_size: int = 32
    num_batches: int = 100
    dense_lr: float = 1e-3
    sparse_lr: float = 0.01
    log_every: int = 10
    ckpt_dir: Optional[str] = None
    save_every: int = 0  # batches; 0 = only at end
    output_trace: bool = False
    tb_log_dir: Optional[str] = None


class DlrmTrainer:
    """Owns the model, split optimizer, and mesh-sharded jitted steps."""

    def __init__(
        self,
        hstu_cfg: DlrmHSTUConfig,
        tables: Tuple[EmbeddingTableConfig, ...],
        cfg: DlrmTrainConfig,
        mesh: Optional[Mesh] = None,
    ) -> None:
        self.mesh = mesh or make_mesh()
        # bind the all-to-all sharded-embedding exchange (torchrec-DMP
        # analogue, `parallel/embedding.py`) when the mesh row-shards tables
        lookup_fn = None
        if self.mesh.shape[MODEL_AXIS] > 1:
            m = self.mesh
            lookup_fn = lambda table, ids: sharded_lookup(table, ids, m)
        self.model = DlrmHSTU(hstu_cfg, tables, lookup_fn=lookup_fn)
        self.cfg = cfg
        self.hstu_cfg = hstu_cfg
        self.tx = None
        self._train_step = None
        self._eval_step = None
        self._param_sh = None
        self._opt_sh = None

    def _init_raw(self, rng: jax.Array, example: Tuple) -> Any:
        uih, ul, cands, nc = example
        return self.model.init(rng, uih, ul, cands, nc, True)

    def init_sharded(self, rng: jax.Array, example: Tuple) -> Tuple[Any, Any]:
        params_shape = jax.eval_shape(self._init_raw, rng, example)
        self._param_sh = param_shardings(self.mesh, params_shape)
        self.tx = make_dlrm_optimizer(
            params_shape["params"],
            dense_lr=self.cfg.dense_lr,
            sparse_lr=self.cfg.sparse_lr,
        )
        tx_init = lambda p: self.tx.init(p["params"])
        opt_shape = jax.eval_shape(tx_init, params_shape)
        self._opt_sh = like_shardings(
            self.mesh, opt_shape, table_shapes_of(params_shape)
        )
        params = jax.jit(
            self._init_raw, out_shardings=self._param_sh,
            static_argnums=(),
        )(rng, example)
        opt_state = jax.jit(tx_init, out_shardings=self._opt_sh)(params)
        return params, opt_state

    def _loss_fn(self, params, batch, rng):
        uih, ul, cands, nc = batch
        r1, r2 = jax.random.split(rng)
        _, _, aux_losses, preds, labels, weights = self.model.apply(
            params, uih, ul, cands, nc, False, True,
            rngs={"dropout": r1, "stochastic_depth": r2},
        )
        total = sum(aux_losses.values())
        return total, (preds, labels, weights)

    def train_step(self, params, opt_state, batch, rng):
        if self._train_step is None:
            rep = replicated(self.mesh)
            b_sh = batch_shardings(self.mesh, batch)

            def step(params, opt_state, batch, rng):
                (loss, (preds, labels, weights)), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(params, batch, rng)
                updates, opt_state = self.tx.update(
                    grads["params"], opt_state, params["params"]
                )
                params = {
                    "params": jax.tree_util.tree_map(
                        lambda p, u: p + u, params["params"], updates
                    )
                }
                return params, opt_state, loss, preds, labels, weights

            self._train_step = jax.jit(
                step,
                in_shardings=(self._param_sh, self._opt_sh, b_sh, rep),
                out_shardings=(
                    self._param_sh, self._opt_sh, rep, rep, rep, rep,
                ),
                donate_argnums=(0, 1),
            )
        return self._train_step(params, opt_state, batch, rng)

    def eval_step(self, params, batch):
        if self._eval_step is None:
            rep = replicated(self.mesh)
            b_sh = batch_shardings(self.mesh, batch)

            def step(params, batch):
                uih, ul, cands, nc = batch
                _, _, _, preds, labels, weights = self.model.apply(
                    params, uih, ul, cands, nc, True, True
                )
                return preds, labels, weights

            self._eval_step = jax.jit(
                step,
                in_shardings=(self._param_sh, b_sh),
                out_shardings=(rep, rep, rep),
            )
        return self._eval_step(params, batch)


def _to_device(batch: Tuple) -> Tuple:
    uih, ul, cands, nc = batch
    return (
        {k: jnp.asarray(v) for k, v in uih.items()},
        jnp.asarray(ul),
        {k: jnp.asarray(v) for k, v in cands.items()},
        jnp.asarray(nc),
    )


def _to_global(trainer: "DlrmTrainer", batch: Tuple) -> Tuple:
    """Multi-host: per-host local rows → global sharded arrays (each host
    feeds 1/process_count of the global batch; see
    `parallel/train.py:to_global_batch`)."""
    if jax.process_count() == 1:
        return batch
    from generative_recommenders_tpu.parallel.sharding import batch_shardings

    sh = batch_shardings(trainer.mesh, batch)

    def mk(s, v):
        return jax.make_array_from_process_local_data(s, np.asarray(v))

    uih, ul, cands, nc = batch
    shu, shl, shc, shn = sh
    return (
        {k: mk(shu[k], v) for k, v in uih.items()},
        mk(shl, ul),
        {k: mk(shc[k], v) for k, v in cands.items()},
        mk(shn, nc),
    )


def train_loop(
    trainer: DlrmTrainer,
    batches: Iterator[Tuple],
    seed: int = 0,
) -> Dict[str, Any]:
    """`dlrm_v3/train/utils.py:320-376`."""
    from generative_recommenders_tpu.utils.tb import SummaryLogger

    cfg = trainer.cfg
    rng = jax.random.PRNGKey(seed)
    metrics = MetricsLogger(trainer.hstu_cfg.multitask_configs)
    tb = SummaryLogger(cfg.tb_log_dir)
    profiler = Profiler() if cfg.output_trace else None
    params = opt_state = None
    t0 = time.time()
    n_examples = 0
    step = 0
    from generative_recommenders_tpu.data.dataset import background_prefetch

    for step, raw in enumerate(background_prefetch(batches, size=8)):
        batch = (
            _to_global(trainer, raw)
            if jax.process_count() > 1
            else _to_device(raw)
        )
        if params is None:
            params, opt_state = trainer.init_sharded(rng, batch)
            if cfg.ckpt_dir and latest_step(cfg.ckpt_dir) is not None:
                params = restore_checkpoint(cfg.ckpt_dir, params)
                logger.info("restored checkpoint from %s", cfg.ckpt_dir)
        step_rng = jax.random.fold_in(rng, step)
        params, opt_state, loss, preds, labels, weights = trainer.train_step(
            params, opt_state, batch, step_rng
        )
        metrics.update(preds, labels, weights)
        n_examples += batch[1].shape[0]
        if profiler is not None:
            profiler.step()
        if step % cfg.log_every == 0:
            logger.info(
                "step %d: loss %.5f (%.1f ex/s)",
                step, float(loss), n_examples / (time.time() - t0),
            )
            tb.scalar("losses/total", float(loss), step)
            tb.scalars(metrics.compute_and_log(step), step, prefix="train/")
        if cfg.ckpt_dir and cfg.save_every and step and step % cfg.save_every == 0:
            save_checkpoint(cfg.ckpt_dir, params, step)
    if profiler is not None:
        profiler.close()
    if cfg.ckpt_dir:
        save_checkpoint(cfg.ckpt_dir, params, step + 1)
    tb.close()
    return {
        "params": params,
        "opt_state": opt_state,
        "metrics": metrics.compute(),
        "examples_per_s": n_examples / (time.time() - t0),
    }


def eval_loop(
    trainer: DlrmTrainer, params: Any, batches: Iterator[Tuple]
) -> Dict[str, float]:
    """`dlrm_v3/train/utils.py:378-419`."""
    metrics = MetricsLogger(trainer.hstu_cfg.multitask_configs)
    for raw in batches:
        preds, labels, weights = trainer.eval_step(params, _to_device(raw))
        metrics.update(preds, labels, weights)
    return metrics.compute()
