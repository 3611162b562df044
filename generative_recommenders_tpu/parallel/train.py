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
