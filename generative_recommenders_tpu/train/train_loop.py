"""Research training loop: jitted train/eval steps + epoch driver.

TPU twin of `research/trainer/train.py:73-537` (train_fn). DDP disappears
into sharding: the steps below are pure jitted functions; the distributed
variant wraps them with NamedSharding over a mesh (see parallel/).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from generative_recommenders_tpu.data.dataset import (
    SequenceDataset,
    batch_iterator,
)
from generative_recommenders_tpu.data.features import (
    scatter_target_into_ids,
    seq_features_from_row,
)
from generative_recommenders_tpu.models.losses import (
    bce_loss,
    bce_loss_with_ratings,
    sampled_softmax_loss,
    sampled_softmax_loss_from_logits,
)
from generative_recommenders_tpu.models.samplers import (
    InBatchNegativesSampler,
    LocalNegativesSampler,
    maybe_l2_norm,
)
from generative_recommenders_tpu.models.sequential import (
    ModelConfig,
    SequentialRecommender,
)
from generative_recommenders_tpu.train.eval_metrics import (
    MAX_K,
    MetricsAccumulator,
    build_id_to_col,
    metrics_from_ranks,
    ranks_from_scores,
    target_ranks,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the gin-configurable `train_fn` signature
    (`research/trainer/train.py:98-136`) as a dataclass."""

    model: ModelConfig
    local_batch_size: int = 128
    eval_batch_size: int = 128
    num_epochs: int = 101
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    num_warmup_steps: int = 0
    sampling_strategy: str = "local"  # "local" | "in-batch"
    loss_module: str = "SampledSoftmaxLoss"  # | "BCELoss"
    num_negatives: int = 128
    temperature: float = 0.05
    item_l2_norm: bool = True
    l2_norm_eps: float = 1e-6
    eval_interval: int = 100
    full_eval_every_n: int = 1
    partial_eval_num_iters: int = 32
    random_seed: int = 42
    # aux-loss weights (`research/trainer/train.py:86-95` get_weighted_loss),
    # e.g. (("mi_loss", 0.001),) for MoL load balancing
    loss_weights: Tuple[Tuple[str, float], ...] = ()
    eval_item_chunk_size: int = 8192  # MoL eval corpus microbatching
    # stochastic length (`common.py:204-216`): rows longer than N^(alpha/2)
    # are truncated to that threshold w.p. 1 - N^alpha/n^2. 0 = off.
    stochastic_length_alpha: float = 0.0
    # seq-len compile bucketing (`common.py:250-289`): slice each batch to
    # the smallest bucket covering its longest row; one compile per bucket
    seq_len_buckets: Tuple[int, ...] = ()
    runtime_bucketing: bool = False  # next-power-of-2 instead of buckets
    # host data pipeline (DataLoader num_workers/prefetch_factor twin,
    # `research/trainer/data_loader.py:25-57`); 0 = synchronous
    num_workers: int = 4
    prefetch_factor: int = 16
    # rematerialize the sampled-softmax loss in backward
    # (`losses/sampled_softmax.py:170-175` activation checkpointing)
    loss_activation_checkpoint: bool = False


class ResearchTrainer:
    """Owns the model, optimizer, jitted steps and the eval state."""

    def __init__(self, cfg: TrainConfig, all_item_ids: np.ndarray) -> None:
        self.cfg = cfg
        # sharded-lookup exchange; DistributedTrainer rebinds both when the
        # mesh row-shards the item table (`parallel/train.py`)
        self._lookup_fn = None
        self.model = SequentialRecommender(cfg.model)
        self.all_item_ids = np.asarray(all_item_ids, dtype=np.int32)
        self._id_to_col = jnp.asarray(
            build_id_to_col(self.all_item_ids, cfg.model.num_items)
        )
        schedule: Any
        if cfg.num_warmup_steps > 0:
            schedule = optax.join_schedules(
                [
                    optax.linear_schedule(
                        cfg.learning_rate / cfg.num_warmup_steps,
                        cfg.learning_rate,
                        cfg.num_warmup_steps,
                    ),
                    optax.constant_schedule(cfg.learning_rate),
                ],
                [cfg.num_warmup_steps],
            )
        else:
            schedule = cfg.learning_rate
        # AdamW β=(0.9, 0.98) per `research/trainer/train.py:272-277`.
        self.tx = optax.adamw(
            schedule, b1=0.9, b2=0.98, eps=1e-8, weight_decay=cfg.weight_decay
        )
        if cfg.sampling_strategy == "local":
            self.sampler = LocalNegativesSampler(
                all_item_ids=jnp.asarray(self.all_item_ids),
                l2_norm=cfg.item_l2_norm,
                l2_norm_eps=cfg.l2_norm_eps,
            )
        elif cfg.sampling_strategy == "in-batch":
            self.sampler = InBatchNegativesSampler(
                l2_norm=cfg.item_l2_norm,
                l2_norm_eps=cfg.l2_norm_eps,
                dedup_embeddings=True,
            )
        else:
            raise ValueError(f"Unknown sampling_strategy {cfg.sampling_strategy}")
        assert not (
            cfg.stochastic_length_alpha > 0.0
            and cfg.loss_module == "BCELossWithRatings"
        ), "SL sampling reads ratings from features; BCELossWithRatings reads the raw batch"
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._encode_step = jax.jit(self._encode_impl)
        self._item_embs = jax.jit(self._item_embs_impl)

    # ------------------------------------------------------------------ init
    def init_params(self, rng: jax.Array) -> Any:
        cfg = self.cfg.model
        B, N = self.cfg.local_batch_size, cfg.total_seq_len
        dummy = {
            "timestamps": jnp.zeros((B, N), jnp.int32),
            "ratings": jnp.zeros((B, N), jnp.int32),
        }
        return self.model.init(
            rng,
            jnp.ones((B,), jnp.int32),
            jnp.zeros((B, N), jnp.int32),
            dummy,
            method=SequentialRecommender.initialize,
        )

    def init_opt_state(self, params: Any) -> Any:
        return self.tx.init(params)

    # ------------------------------------------------------------- train step
    def _loss(
        self, params: Any, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        cfg = self.cfg
        apply = self.model.apply
        features, target_ids, _ = seq_features_from_row(
            batch, max_output_length=cfg.model.gr_output_length + 1
        )
        rng_drop, rng_neg = jax.random.split(rng)
        if cfg.stochastic_length_alpha > 0.0:
            # SL sampling in the hot path (`common.py:204-216`)
            from generative_recommenders_tpu.utils.bucketing import (
                apply_stochastic_length,
                truncate_to_stochastic_length,
            )

            rng_drop, rng_sl = jax.random.split(rng_drop)
            old_len = features.past_lengths
            new_len = apply_stochastic_length(
                old_len, cfg.stochastic_length_alpha,
                cfg.model.max_sequence_len, rng_sl,
            )
            features = features._replace(
                past_lengths=new_len,
                past_ids=truncate_to_stochastic_length(
                    features.past_ids, old_len, new_len
                ),
                past_payloads={
                    # the target timestamp sits at position `old_len`; the
                    # shift relocates it to `new_len` — keep that slot
                    "timestamps": truncate_to_stochastic_length(
                        features.past_payloads["timestamps"], old_len,
                        new_len, extra_positions=1,
                    ),
                    "ratings": truncate_to_stochastic_length(
                        features.past_payloads["ratings"], old_len, new_len
                    ),
                },
            )
        past_ids = scatter_target_into_ids(
            features.past_ids, features.past_lengths, target_ids
        )
        input_embeddings = apply(
            params, past_ids, method=SequentialRecommender.get_item_embeddings
        )
        seq_embeddings = apply(
            params,
            features.past_lengths,
            past_ids,
            input_embeddings,
            features.past_payloads,
            False,
            rngs={"dropout": rng_drop},
        )  # [B, N, D]

        supervision_ids = past_ids  # [B, N]
        output = seq_embeddings[:, :-1, :]
        sup_ids = supervision_ids[:, 1:]
        sup_emb = input_embeddings[:, 1:, :]
        ar_mask = (sup_ids != 0).astype(jnp.float32)

        if cfg.sampling_strategy == "in-batch":
            flat_ids = supervision_ids.reshape(-1)
            state = self.sampler.process_batch(
                ids=flat_ids,
                presences=flat_ids != 0,
                embeddings=input_embeddings.reshape(-1, input_embeddings.shape[-1]),
            )
            neg_ids, neg_emb = self.sampler(
                rng_neg, state, sup_ids,
                1 if cfg.loss_module == "BCELoss" else cfg.num_negatives,
            )
        else:
            if cfg.model.compute_dtype == "bfloat16":
                # negatives gather is HBM-bound (3.4M rows/step at the
                # flagship config); a bf16 table gather is ~3x faster and
                # the sampled-softmax logits tolerate it (the loss still
                # log-softmaxes in f32)
                table = params["params"]["embedding_module"]["item_emb"]
                table16 = table.astype(jnp.bfloat16)
                lookup_fn = self._lookup_fn

                def emb_fn(ids):
                    clipped = jnp.clip(ids, 0, cfg.model.num_items)
                    if lookup_fn is not None and ids.ndim >= 2:
                        # keep the no-table-allgather guarantee on the bf16
                        # negatives fast path too
                        e = lookup_fn(
                            table16, clipped.reshape(ids.shape[0], -1)
                        ).reshape(*ids.shape, table16.shape[-1])
                    else:
                        e = jnp.take(table16, clipped, axis=0)
                    return e * (ids != 0)[..., None].astype(e.dtype)

            else:
                emb_fn = lambda ids: apply(
                    params, ids, method=SequentialRecommender.get_item_embeddings
                )
            neg_ids, neg_emb = self.sampler(
                rng_neg, sup_ids,
                1 if cfg.loss_module == "BCELoss" else cfg.num_negatives,
                emb_fn,
            )

        pos_emb = maybe_l2_norm(sup_emb, cfg.item_l2_norm, cfg.l2_norm_eps)
        is_mol = cfg.model.interaction_module_type == "MoL"
        if cfg.loss_module == "SampledSoftmaxLoss" and is_mol:
            # logits via the learned similarity (`sampled_softmax.py:65-81`)
            B, Nm1, D = output.shape
            R = neg_emb.shape[2]
            rng_sim = jax.random.fold_in(rng_drop, 7)
            queries = output.reshape(B * Nm1, D)
            items = jnp.concatenate(
                [pos_emb[:, :, None, :], neg_emb], axis=2
            ).reshape(B * Nm1, 1 + R, D)
            uid = batch.get("user_ids")
            uid_flat = (
                jnp.repeat(jnp.asarray(uid).reshape(-1), Nm1)
                if uid is not None
                else None
            )
            logits, aux = apply(
                params, queries, items, uid_flat, False,
                method=SequentialRecommender.similarity_fn,
                rngs={"dropout": rng_sim},
            )
            loss = sampled_softmax_loss_from_logits(
                logits[:, 0].reshape(B, Nm1),
                logits[:, 1:].reshape(B, Nm1, R),
                sup_ids, ar_mask, neg_ids,
                softmax_temperature=cfg.temperature,
            )
        elif cfg.loss_module == "SampledSoftmaxLoss":
            loss_fn = functools.partial(
                sampled_softmax_loss, softmax_temperature=cfg.temperature
            )
            if cfg.loss_activation_checkpoint:
                loss_fn = jax.checkpoint(loss_fn)
            loss, aux = loss_fn(
                output, pos_emb, sup_ids, ar_mask, neg_ids, neg_emb
            )
        elif cfg.loss_module == "BCELoss":
            assert not is_mol, "BCELoss + MoL is not wired up"
            loss, aux = bce_loss(
                output, pos_emb, sup_ids, ar_mask, neg_ids, neg_emb,
                temperature=cfg.temperature,
            )
        elif cfg.loss_module == "BCELossWithRatings":
            assert not is_mol, "BCELossWithRatings + MoL is not wired up"
            sup_ratings = jnp.concatenate(
                [
                    batch["historical_ratings"].astype(jnp.int32),
                    jnp.zeros(
                        (output.shape[0], cfg.model.gr_output_length + 1),
                        jnp.int32,
                    ),
                ],
                axis=1,
            )[:, 1 : output.shape[1] + 1]
            loss, aux = bce_loss_with_ratings(
                output, pos_emb, (sup_ratings > 3).astype(jnp.float32),
                ar_mask, temperature=cfg.temperature,
            )
        else:
            raise ValueError(f"Unknown loss_module {cfg.loss_module}")
        # get_weighted_loss (`train.py:86-95`)
        for key, weight in cfg.loss_weights:
            if key in aux:
                loss = loss + weight * aux[key]
        return loss, aux

    def _train_step_impl(
        self, params: Any, opt_state: Any, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> Tuple[Any, Any, jax.Array]:
        (loss, _aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def train_step(
        self, params: Any, opt_state: Any, batch: Dict[str, np.ndarray], rng: jax.Array
    ) -> Tuple[Any, Any, jax.Array]:
        cfg = self.cfg
        if cfg.seq_len_buckets or cfg.runtime_bucketing:
            from generative_recommenders_tpu.utils.bucketing import (
                bucket_batch,
            )

            batch = bucket_batch(
                batch, cfg.seq_len_buckets, cfg.runtime_bucketing
            )
        return self._train_step(params, opt_state, batch, rng)

    # -------------------------------------------------------------- eval step
    def _item_embs_impl(self, params: Any) -> jax.Array:
        """Normalized candidate-corpus embeddings (`eval.py:54-66`)."""
        embs = self.model.apply(
            params,
            jnp.asarray(self.all_item_ids),
            method=SequentialRecommender.get_item_embeddings,
        )
        return maybe_l2_norm(embs, self.cfg.item_l2_norm, self.cfg.l2_norm_eps)

    def _encode_impl(
        self, params: Any, batch: Dict[str, jax.Array], item_embs: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        features, target_ids, target_ratings = seq_features_from_row(
            batch, max_output_length=self.cfg.model.gr_output_length + 1
        )
        apply = self.model.apply
        input_embeddings = apply(
            params, features.past_ids,
            method=SequentialRecommender.get_item_embeddings,
        )
        query = apply(
            params,
            features.past_lengths,
            features.past_ids,
            input_embeddings,
            features.past_payloads,
            True,
            method=SequentialRecommender.encode,
        )
        k = min(MAX_K, int(self.all_item_ids.shape[0]))
        if self.cfg.model.interaction_module_type == "MoL":
            scores = self._mol_corpus_scores(
                params, query, item_embs, batch.get("user_ids")
            )
            ranks = ranks_from_scores(
                scores, self._id_to_col, target_ids[:, 0], features.past_ids,
                k=k,
            )
        else:
            ranks = target_ranks(
                query, item_embs, self._id_to_col, target_ids[:, 0],
                features.past_ids, k=k,
            )
        return ranks, target_ratings[:, 0]

    def _mol_corpus_scores(
        self, params: Any, query: jax.Array, item_embs: jax.Array,
        user_ids: Optional[jax.Array],
    ) -> jax.Array:
        """Full-corpus MoL scores, microbatched over items (MoL brute-force
        top-k, `research/rails/indexing/mol_top_k.py:35-133`)."""
        apply = self.model.apply
        X = item_embs.shape[0]
        chunk = min(self.cfg.eval_item_chunk_size, X)
        pad = (-X) % chunk
        padded = jnp.pad(item_embs, ((0, pad), (0, 0)))
        i_comp, gi = apply(
            params, padded, method=SequentialRecommender.mol_item_components
        )
        uid = jnp.asarray(user_ids).reshape(-1) if user_ids is not None else None

        has_gi = gi is not None

        def score_chunk(args):
            ic, g = args[0], (args[1] if has_gi else None)
            return apply(
                params, query, ic, g, uid,
                method=SequentialRecommender.mol_score_components,
            )

        n_chunks = padded.shape[0] // chunk
        ic = i_comp.reshape(n_chunks, chunk, *i_comp.shape[1:])
        g = (
            gi.reshape(n_chunks, chunk, gi.shape[-1])
            if has_gi
            else jnp.zeros((n_chunks, chunk, 1), jnp.float32)
        )
        scores = jax.lax.map(score_chunk, (ic, g))  # [n_chunks, B, chunk]
        scores = jnp.moveaxis(scores, 0, 1).reshape(query.shape[0], -1)
        return scores[:, :X]

    def eval_epoch(
        self,
        params: Any,
        eval_batches: Iterator[Dict[str, np.ndarray]],
        max_iters: Optional[int] = None,
    ) -> Dict[str, float]:
        item_embs = self._item_embs(params)
        acc = MetricsAccumulator()
        for i, batch in enumerate(eval_batches):
            ranks, ratings = self._encode_step(params, batch, item_embs)
            acc.update(metrics_from_ranks(ranks, ratings))
            if max_iters is not None and i + 1 >= max_iters:
                break
        return acc.compute()


def train_loop(
    cfg: TrainConfig,
    train_dataset: SequenceDataset,
    eval_dataset: SequenceDataset,
    log_every: int = 100,
    max_steps: Optional[int] = None,
    tb_log_dir: Optional[str] = None,
    ckpt_dir: Optional[str] = None,
    save_ckpt_every_n: int = 0,  # epochs; 0 = never (`train.py:507-515`)
) -> Dict[str, Any]:
    """Epoch driver mirroring `train_fn`'s hot loop (`train.py:306-521`)."""
    from generative_recommenders_tpu.utils.tb import SummaryLogger

    tb = SummaryLogger(tb_log_dir)
    trainer = ResearchTrainer(cfg, train_dataset.all_item_ids())
    rng = jax.random.PRNGKey(cfg.random_seed)
    rng, init_rng = jax.random.split(rng)
    params = trainer.init_params(init_rng)
    opt_state = trainer.init_opt_state(params)

    from generative_recommenders_tpu.data.dataset import (
        prefetched_batch_iterator,
    )

    batch_id = 0
    history = []
    t0 = time.time()
    for epoch in range(cfg.num_epochs):
        if cfg.num_workers > 0:
            epoch_batches = prefetched_batch_iterator(
                train_dataset, cfg.local_batch_size, shuffle=True,
                seed=cfg.random_seed + epoch,
                num_workers=cfg.num_workers,
                prefetch_factor=cfg.prefetch_factor,
            )
        else:
            epoch_batches = batch_iterator(
                train_dataset, cfg.local_batch_size, shuffle=True,
                seed=cfg.random_seed + epoch,
            )
        for batch in epoch_batches:
            # mid-epoch partial eval every eval_interval batches
            # (`research/trainer/train.py` "(every eval_interval) eval")
            if (
                cfg.eval_interval > 0
                and batch_id > 0
                and batch_id % cfg.eval_interval == 0
            ):
                m = trainer.eval_epoch(
                    params,
                    batch_iterator(
                        eval_dataset, cfg.eval_batch_size, shuffle=True,
                        seed=cfg.random_seed + batch_id,
                    ),
                    max_iters=cfg.partial_eval_num_iters,
                )
                tb.scalars(m, batch_id, prefix="eval_interval/")
                logger.info(
                    "step %d partial eval: HR@10 %.4f NDCG@10 %.4f",
                    batch_id, m.get("hr@10", float("nan")),
                    m.get("ndcg@10", float("nan")),
                )
            step_rng = jax.random.fold_in(rng, batch_id)
            params, opt_state, loss = trainer.train_step(
                params, opt_state, batch, step_rng
            )
            if batch_id % log_every == 0:
                logger.info(
                    "step %d (epoch %d, %.1fs): loss %.6f",
                    batch_id, epoch, time.time() - t0, float(loss),
                )
                tb.scalar("losses/ar_loss", float(loss), batch_id)
            batch_id += 1
            if max_steps is not None and batch_id >= max_steps:
                break

        is_full = (epoch % cfg.full_eval_every_n) == 0
        metrics = trainer.eval_epoch(
            params,
            batch_iterator(
                eval_dataset, cfg.eval_batch_size, shuffle=True,
                seed=cfg.random_seed + epoch,
            ),
            max_iters=None if is_full else cfg.partial_eval_num_iters,
        )
        metrics["epoch"] = epoch
        history.append(metrics)
        tb.scalars(metrics, batch_id, prefix="eval/")
        if ckpt_dir and save_ckpt_every_n and (epoch + 1) % save_ckpt_every_n == 0:
            from generative_recommenders_tpu.utils.checkpoint import (
                save_checkpoint,
            )

            save_checkpoint(
                ckpt_dir, {"params": params, "opt_state": opt_state}, epoch
            )
            logger.info("checkpoint @ epoch %d -> %s", epoch, ckpt_dir)
        logger.info(
            "eval epoch %d: NDCG@10 %.4f HR@10 %.4f HR@50 %.4f MRR %.4f",
            epoch,
            metrics.get("ndcg@10", float("nan")),
            metrics.get("hr@10", float("nan")),
            metrics.get("hr@50", float("nan")),
            metrics.get("mrr", float("nan")),
        )
        if max_steps is not None and batch_id >= max_steps:
            break
    tb.close()
    return {"params": params, "opt_state": opt_state, "history": history}
