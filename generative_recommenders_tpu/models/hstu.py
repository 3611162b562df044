"""HSTU encoder (research stack), TPU-native.

Implements the paper model from `research/modeling/sequential/hstu.py`
("Actions Speak Louder than Words", ICML'24) as flax modules over the XLA /
Pallas HSTU-attention ops:

  per layer:  x + Dropout(Linear( u * LN(attn) ))
     where    [u, v, q, k] = split(silu(LN(x) @ W_uvqk))
              attn = (silu(q k^T + rel_bias) / N) · causal_mask @ v

Layout is padded-dense [B, N, D] (N = max_sequence_len + max_output_len); the
jagged compute saving is recovered inside the Pallas attention kernel via
length-aware block skipping.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_recommenders_tpu.ops.attention_mask import make_causal_mask
from generative_recommenders_tpu.ops.normalization import layer_norm
from generative_recommenders_tpu.ops.xla.hstu_attention import hstu_mha_dense


class RelativePositionalBias(nn.Module):
    """Pure relative-position toeplitz bias (`hstu.py:66-84`):
    bias[i, j] = w[j - i + N - 1]."""

    max_seq_len: int  # table size (model max; runtime N may be bucketed smaller)

    @nn.compact
    def __call__(
        self,
        all_timestamps: Optional[jax.Array],
        runtime_len: Optional[int] = None,
    ) -> jax.Array:
        Nm = self.max_seq_len
        N = runtime_len or Nm
        w = self.param(
            "w", nn.initializers.normal(0.02), (2 * Nm - 1,), jnp.float32
        )
        i = jnp.arange(N, dtype=jnp.int32)
        rel = i[None, :] - i[:, None] + Nm - 1  # [N, N] in table range
        return jnp.take(w, rel, axis=0)[None, :, :]  # [1, N, N]


class RelativeBucketedTimeAndPositionBasedBias(nn.Module):
    """Relative position + bucketized-timespan bias (`hstu.py:87-144`).

    ts bias term [b, i, j] = ts_w[bucket(ts[b, min(i+1, N-1)] - ts[b, j])]
    with bucket(x) = clip(floor(log(max(|x|, 1)) / 0.301), 0, num_buckets).
    """

    max_seq_len: int  # table size (model max; runtime N may be bucketed smaller)
    num_buckets: int = 128

    @nn.compact
    def __call__(
        self,
        all_timestamps: jax.Array,
        row_idx: Optional[jax.Array] = None,  # int[B, M] — delta rows only
        return_raw: bool = False,
    ) -> jax.Array:
        """Full [1/B, N, N] bias, or — with ``row_idx`` — just the delta
        rows [B, M, N] (the KV-cached encode path, `hstu.py:150-223`).
        ``return_raw`` instead returns the raw ``(pos_w, ts_w)`` tables for
        the in-kernel rel-bias Pallas path (same params, nothing
        materialized)."""
        N = all_timestamps.shape[1]
        Nm = self.max_seq_len
        ts_w = self.param(
            "ts_w", nn.initializers.normal(0.02), (self.num_buckets + 1,), jnp.float32
        )
        pos_w = self.param(
            "pos_w", nn.initializers.normal(0.02), (2 * Nm - 1,), jnp.float32
        )
        if return_raw:
            return pos_w, ts_w
        i = jnp.arange(N, dtype=jnp.int32)
        ts = all_timestamps.astype(jnp.float32)  # [B, N]
        ext = jnp.concatenate([ts, ts[:, N - 1 : N]], axis=1)  # [B, N + 1]
        if row_idx is not None:
            # toeplitz convention: bias[i, j] = pos_w[j - i + Nm - 1]
            rel = i[None, None, :] - row_idx[:, :, None] + Nm - 1  # [B, M, N]
            rel_pos_bias = jnp.take(pos_w, jnp.clip(rel, 0, 2 * Nm - 2), axis=0)
            row_next = jnp.clip(row_idx + 1, 0, N)
            dt = (
                jnp.take_along_axis(ext, row_next, axis=1)[:, :, None]
                - ts[:, None, :]
            )  # [B, M, N]
            bucketed = jnp.clip(
                jnp.floor(
                    jnp.log(jnp.maximum(jnp.abs(dt), 1.0)) / 0.301
                ).astype(jnp.int32),
                0,
                self.num_buckets,
            )
            return rel_pos_bias + jnp.take(ts_w, bucketed, axis=0)
        rel = i[None, :] - i[:, None] + Nm - 1
        rel_pos_bias = jnp.take(pos_w, rel, axis=0)[None, :, :]  # [1, N, N]

        dt = ext[:, 1:, None] - ext[:, None, :-1]  # [B, N, N]
        bucketed = jnp.clip(
            jnp.floor(jnp.log(jnp.maximum(jnp.abs(dt), 1.0)) / 0.301).astype(
                jnp.int32
            ),
            0,
            self.num_buckets,
        )
        bucketed = jax.lax.stop_gradient(bucketed)
        # one-hot compare-reduce instead of jnp.take: XLA lowers a
        # scalar-element gather from this tiny table at [B, N, N] indices
        # ~40x slower than the fused compare+select reduction (44ms vs
        # 1.4ms at B128/N211 on v5e), and its scatter-add transpose is
        # similarly bad; this formulation also autodiffs to the fast form.
        # (GR_TPU_BIAS_GATHER=take switches to the plain gather for the
        # numerics-ablation harness, benchmarks/parity_quality.py.)
        import os

        if os.environ.get("GR_TPU_BIAS_GATHER") == "take":
            rel_ts_bias = jnp.take(ts_w, bucketed, axis=0)
        else:
            iota = jnp.arange(self.num_buckets + 1, dtype=jnp.int32)
            rel_ts_bias = jnp.sum(
                jnp.where(bucketed[..., None] == iota, ts_w, 0.0), axis=-1
            )  # [B, N, N]
        return rel_pos_bias + rel_ts_bias


class SequentialTransductionUnit(nn.Module):
    """One HSTU block (`hstu.py:226-444`), padded-dense layout."""

    embedding_dim: int
    linear_dim: int  # dv
    attention_dim: int  # dqk
    num_heads: int
    dropout_ratio: float
    attn_dropout_ratio: float = 0.0
    linear_activation: str = "silu"
    concat_ua: bool = False
    enable_relative_attention_bias: bool = True
    relative_bias_num_buckets: int = 128
    normalization: str = "rel_bias"
    epsilon: float = 1e-6
    attn_kernel: str = "xla"  # "xla" | "pallas"
    # model-max length for rel-bias table sizing; 0 = runtime N (set it when
    # seq-len bucketing feeds bucketed (shorter) batches)
    max_total_seq_len: int = 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, N, D]; delta mode: [B, M, D] (newest M tokens)
        lengths: jax.Array,  # int[B] (used by the pallas kernel for block skip)
        all_timestamps: Optional[jax.Array],  # int[B, N] — ALWAYS full-length
        mask: Optional[jax.Array],  # [N, N] or [B, N, N]; None => causal
        deterministic: bool = False,
        delta_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
        cache_lengths: Optional[jax.Array] = None,  # int[B] — prefix length
        return_cache: bool = False,
    ):
        """Full forward, or — with ``delta_cache=(k, v)`` — the KV-cached
        delta path (`hstu.py:147-223` delta_x_offsets): only the M newest
        tokens are computed, attending over cached K/V extended in place.
        ``return_cache`` additionally returns this layer's (k, v) state
        [B, N(+M), H, d]."""
        B, N, D = x.shape
        H, dqk, dv = self.num_heads, self.attention_dim, self.linear_dim
        normed_x = layer_norm(x, eps=self.epsilon)  # non-affine (hstu.py:276-277)

        uvqk_w = self.param(
            "uvqk",
            nn.initializers.normal(0.02),
            (D, dv * H * 2 + dqk * H * 2),
            jnp.float32,
        )
        mixed = jnp.einsum(
            "bnd,de->bne", normed_x, uvqk_w, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if self.linear_activation == "silu":
            mixed = jax.nn.silu(mixed)
        elif self.linear_activation != "none":
            raise ValueError(f"Unknown linear_activation {self.linear_activation}")
        u, v, q, k = jnp.split(mixed, [dv * H, 2 * dv * H, 2 * dv * H + dqk * H], axis=-1)
        if delta_cache is not None:
            return self._delta_attend(
                x, u, q, k, v, delta_cache, cache_lengths, all_timestamps,
                deterministic,
            )

        wants_bias = self.normalization in ("rel_bias", "hstu_rel_bias") and (
            self.enable_relative_attention_bias
        )
        tbl_len = self.max_total_seq_len or N
        attn_kernel = self.attn_kernel
        if attn_kernel == "auto":
            # Two measured thresholds (v5e, benchmarks/tpu_r5_results):
            #  * no-bias path: fused XLA attention wins below N~512 (per-step
            #    grid overhead dominates the Pallas path at short N); the
            #    flash kernel wins ~2.7x at N>=1024.
            #  * rel-bias path: the XLA fallback materializes [B, N, N] f32
            #    bias + S residuals, so the in-kernel bias wins much earlier
            #    (1.90x step time at N=512/B=32; XLA OOMs outright at
            #    N=1024/B=32) — gate at N>=256.
            bias_path = wants_bias and all_timestamps is not None
            attn_kernel = (
                "pallas" if N >= (256 if bias_path else 512) else "xla"
            )

        # the flagship path: time+position rel bias computed INSIDE the
        # flash kernel (fwd + bwd) — nothing [B, N, N] is ever built
        use_relbias_kernel = False
        if attn_kernel == "pallas" and wants_bias and all_timestamps is not None:
            from generative_recommenders_tpu.ops.pallas.hstu_attention_relbias import (  # noqa: E501
                relbias_pallas_supported,
            )

            use_relbias_kernel = (
                self.relative_bias_num_buckets <= 128
                and self.attn_dropout_ratio == 0.0
                and relbias_pallas_supported(
                    H, N, dqk, dv, jnp.dtype(x.dtype).itemsize
                )
            )

        bias = None
        if wants_bias and not use_relbias_kernel:
            if all_timestamps is not None:
                bias = RelativeBucketedTimeAndPositionBasedBias(
                    max_seq_len=tbl_len,
                    num_buckets=self.relative_bias_num_buckets,
                    name="rel_attn_bias",
                )(all_timestamps)
            else:
                bias = RelativePositionalBias(
                    max_seq_len=tbl_len, name="rel_attn_bias"
                )(None, runtime_len=N)
            bias = jnp.broadcast_to(bias, (B, N, N))

        dropout_rng = None
        if self.attn_dropout_ratio > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        if attn_kernel == "pallas" and bias is not None:
            # pure-positional bias (no timestamps) or unsupported geometry:
            # materialized-bias training uses the fused XLA attention (with
            # the bias gathers in their fast one-hot form)
            attn_kernel = "xla"
        if attn_kernel == "pallas" and self.attn_dropout_ratio > 0.0:
            raise ValueError(
                "attn_dropout_rate > 0 is not supported by the Pallas "
                "attention kernel; use attn_kernel='xla'"
            )
        if use_relbias_kernel:
            from generative_recommenders_tpu.ops.pallas.hstu_attention_relbias import (  # noqa: E501
                hstu_mha_dense_pallas_relbias,
            )

            pos_w, ts_w = RelativeBucketedTimeAndPositionBasedBias(
                max_seq_len=tbl_len,
                num_buckets=self.relative_bias_num_buckets,
                name="rel_attn_bias",
            )(all_timestamps, return_raw=True)
            attn = hstu_mha_dense_pallas_relbias(
                q.reshape(B, N, H, dqk),
                k.reshape(B, N, H, dqk),
                v.reshape(B, N, H, dv),
                lengths=lengths,
                timestamps=all_timestamps,
                pos_w=pos_w,
                ts_w=ts_w,
                alpha=1.0,
                max_seq_len=N,
                num_buckets=self.relative_bias_num_buckets,
                causal=True,
            )
        elif attn_kernel == "pallas":
            from generative_recommenders_tpu.ops.pallas.hstu_attention import (
                hstu_mha_dense_pallas,
            )

            attn = hstu_mha_dense_pallas(
                q.reshape(B, N, H, dqk),
                k.reshape(B, N, H, dqk),
                v.reshape(B, N, H, dv),
                lengths=lengths,
                alpha=1.0,
                max_seq_len=N,
                bias=bias,
                causal=True,
            )
        else:
            attn = hstu_mha_dense(
                q.reshape(B, N, H, dqk),
                k.reshape(B, N, H, dqk),
                v.reshape(B, N, H, dv),
                alpha=1.0,
                max_seq_len=N,
                mask=(mask[None] if mask is not None and mask.ndim == 2 else mask),
                bias=bias,
                dropout_pr=0.0 if deterministic else self.attn_dropout_ratio,
                dropout_rng=dropout_rng,
            )
        attn = attn.reshape(B, N, H * dv)

        if self.concat_ua:
            a = layer_norm(attn, eps=self.epsilon)
            o_input = jnp.concatenate([u, a, u * a], axis=-1)
        else:
            o_input = u * layer_norm(attn, eps=self.epsilon)

        o_input = nn.Dropout(self.dropout_ratio)(o_input, deterministic=deterministic)
        out = self._output_dense(o_input) + x
        if return_cache:
            return out, (k.reshape(B, N, H, dqk), v.reshape(B, N, H, dv))
        return out

    def _output_dense(self, o_input: jax.Array) -> jax.Array:
        H, dv = self.num_heads, self.linear_dim
        fan_in = dv * H * (3 if self.concat_ua else 1)
        bound = 1.0 / fan_in**0.5

        def _torch_linear_bias_init(key, shape, dtype=jnp.float32):
            # torch Linear default bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.Dense(
            self.embedding_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=_torch_linear_bias_init,
            name="o",
        )(o_input)

    def _delta_attend(
        self,
        delta_x: jax.Array,  # [B, M, D]
        u: jax.Array,  # [B, M, H*dv]
        q: jax.Array,  # [B, M, H*dqk]
        delta_k: jax.Array,
        delta_v: jax.Array,
        cache: Tuple[jax.Array, jax.Array],  # k/v [B, Nc, H, d]
        cache_lengths: jax.Array,  # int[B] — valid prefix per row
        all_timestamps: Optional[jax.Array],  # int[B, Nc + M] full
        deterministic: bool,
    ):
        """KV-cached delta attention (`hstu.py:150-223`): extend the cache by
        the M delta tokens at positions cache_lengths..cache_lengths+M-1,
        attend the delta queries over the full K/V, finish the block."""
        from generative_recommenders_tpu.ops.attention_mask import (
            make_delta_attn_mask,
        )

        B, M, D = delta_x.shape
        H, dqk, dv = self.num_heads, self.attention_dim, self.linear_dim
        k_cache, v_cache = cache
        Nc = k_cache.shape[1]
        Nfull = Nc + M
        pad = [(0, 0), (0, M), (0, 0), (0, 0)]
        full_k = jnp.pad(k_cache, pad)
        full_v = jnp.pad(v_cache, pad)
        rows_b = jnp.arange(B, dtype=jnp.int32)[:, None]
        cols = cache_lengths[:, None] + jnp.arange(M, dtype=jnp.int32)[None, :]
        full_k = full_k.at[rows_b, cols].set(
            delta_k.reshape(B, M, H, dqk).astype(full_k.dtype)
        )
        full_v = full_v.at[rows_b, cols].set(
            delta_v.reshape(B, M, H, dv).astype(full_v.dtype)
        )
        full_lengths = cache_lengths + M

        s = jnp.einsum(
            "bmhd,bnhd->bhmn",
            q.reshape(B, M, H, dqk),
            full_k,
            preferred_element_type=jnp.float32,
        )
        if (
            self.normalization in ("rel_bias", "hstu_rel_bias")
            and self.enable_relative_attention_bias
        ):
            tbl_len = self.max_total_seq_len or Nfull
            assert all_timestamps is not None, (
                "delta path with rel bias needs full timestamps"
            )
            bias = RelativeBucketedTimeAndPositionBasedBias(
                max_seq_len=tbl_len,
                num_buckets=self.relative_bias_num_buckets,
                name="rel_attn_bias",
            )(all_timestamps, row_idx=cols)
            s = s + bias[:, None, :, :]
        p = jax.nn.silu(s) / Nfull
        delta_mask = make_delta_attn_mask(
            full_k.shape[1], full_lengths, cols, causal=True
        )
        p = p * delta_mask[:, None, :, :].astype(p.dtype)
        attn = jnp.einsum(
            "bhmn,bnhv->bmhv", p.astype(full_v.dtype), full_v,
            preferred_element_type=jnp.float32,
        ).reshape(B, M, H * dv).astype(delta_x.dtype)

        if self.concat_ua:
            a = layer_norm(attn, eps=self.epsilon)
            o_input = jnp.concatenate([u, a, u * a], axis=-1)
        else:
            o_input = u * layer_norm(attn, eps=self.epsilon)
        o_input = nn.Dropout(self.dropout_ratio)(
            o_input, deterministic=deterministic
        )
        out = self._output_dense(o_input) + delta_x
        return out, (full_k, full_v)


class HSTUEncoder(nn.Module):
    """Stack of SequentialTransductionUnits (`hstu.py:447-540`).

    Input/output are padded-dense [B, N, D]; pads are never read downstream
    (loss masks them; `encode` gathers position lengths-1).
    """

    embedding_dim: int
    num_blocks: int
    num_heads: int
    attention_dim: int  # dqk
    linear_dim: int  # dv
    linear_dropout_rate: float
    attn_dropout_rate: float = 0.0
    linear_activation: str = "silu"
    enable_relative_attention_bias: bool = True
    concat_ua: bool = False
    normalization: str = "rel_bias"
    attn_kernel: str = "xla"
    max_total_seq_len: int = 0  # rel-bias table sizing under bucketing
    remat: bool = False  # activation recomputation per block
    # (the reference's recompute flags, `modules/stu.py:76-78` /
    # `sampled_softmax.py:170-175` — on TPU one jax.checkpoint per block)

    @nn.compact
    def __call__(
        self,
        user_embeddings: jax.Array,  # [B, N, D] (already preprocessed)
        lengths: jax.Array,
        all_timestamps: Optional[jax.Array],
        deterministic: bool = False,
        caches: Optional[List[Tuple[jax.Array, jax.Array]]] = None,
        cache_lengths: Optional[jax.Array] = None,
        return_caches: bool = False,
    ):
        """Full forward; with ``return_caches`` also returns per-layer (k, v)
        states; with ``caches`` runs the KV-cached delta path over the M
        newest tokens (research twin of `hstu.py:284-444` delta_x_offsets)."""
        B, N, D = user_embeddings.shape
        mask = make_causal_mask(N, dtype=jnp.bool_) if caches is None else None
        x = user_embeddings
        block_cls = (
            nn.remat(SequentialTransductionUnit, static_argnums=(5,))
            if self.remat and caches is None and not return_caches
            else SequentialTransductionUnit
        )
        new_caches: List[Tuple[jax.Array, jax.Array]] = []
        for i in range(self.num_blocks):
            block = block_cls(
                embedding_dim=D,
                linear_dim=self.linear_dim,
                attention_dim=self.attention_dim,
                num_heads=self.num_heads,
                dropout_ratio=self.linear_dropout_rate,
                attn_dropout_ratio=self.attn_dropout_rate,
                linear_activation=self.linear_activation,
                concat_ua=self.concat_ua,
                enable_relative_attention_bias=self.enable_relative_attention_bias,
                normalization=self.normalization,
                attn_kernel=self.attn_kernel,
                max_total_seq_len=self.max_total_seq_len,
                name=f"layer_{i}",
            )
            if caches is not None:
                x, cache = block(
                    x, lengths, all_timestamps, mask, deterministic,
                    delta_cache=caches[i], cache_lengths=cache_lengths,
                )
                new_caches.append(cache)
            elif return_caches:
                x, cache = block(
                    x, lengths, all_timestamps, mask, deterministic,
                    return_cache=True,
                )
                new_caches.append(cache)
            else:
                x = block(x, lengths, all_timestamps, mask, deterministic)
        if caches is not None or return_caches:
            return x, new_caches
        return x
