"""STU — the production HSTU layer, with KV cache + M-FALCON delta decode.

TPU twin of `modules/stu.py` (STULayerConfig :64-80, STULayer.forward
:291-352, cached_forward :354-418 — the M-FALCON incremental path — and
STUStack :421-466). Differences by design:

  * layout is padded-dense [B, N, D] + lengths (jaggedness is handled inside
    the Pallas attention kernel), so the jagged split/concat cache helpers
    (`stu.py:83-172`) become mask/scatter ops;
  * flax modules are functional, so the KV cache is an explicit `KVCache`
    value threaded through calls instead of mutable module state;
  * the reference's recompute_normed_x/uvqk/y flags select what the fused
    Triton backward recomputes; here each flag maps to a
    `jax.ad_checkpoint.checkpoint_name` tag on the corresponding
    intermediate (`ops/hstu_compute.py`) and STUStack wraps the layer in
    `nn.remat` with a `save_anything_except_these_names` policy — exactly
    the flagged activations are rematerialized in backward;
  * `sort_by_length` (Triton load-balancing) has no TPU analogue: the
    resident-KV Pallas kernels walk only each row's LIVE kv chunks via an
    in-kernel dynamic-bound loop (grid is (B, n_q) with no per-dead-block
    steps), so wall-clock is already O(sum_i N_i^2) at any length variance.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from generative_recommenders_tpu.ops.hstu_compute import (
    delta_hstu_mha,
    hstu_compute_output,
    hstu_compute_uqvk,
)
from generative_recommenders_tpu.ops.attention_mask import (
    apply_padding_guard,
    make_valid_attn_mask,
)
from generative_recommenders_tpu.ops.xla.hstu_attention import hstu_mha_dense


@dataclasses.dataclass(frozen=True)
class STULayerConfig:
    """Mirrors `modules/stu.py:64-80`."""

    embedding_dim: int
    num_heads: int
    hidden_dim: int
    attention_dim: int
    output_dropout_ratio: float = 0.3
    causal: bool = True
    target_aware: bool = True
    max_attn_len: int = 0
    attn_alpha: Optional[float] = None
    use_group_norm: bool = False
    recompute_normed_x: bool = True
    recompute_uvqk: bool = True
    recompute_y: bool = True
    sort_by_length: bool = True  # no-op on TPU (see module docstring)
    contextual_seq_len: int = 0
    attn_kernel: str = "xla"  # "xla" | "pallas"
    # fixed silu normalizer (the reference's max_seq_len argument); None =>
    # the padded sequence length of each call. Set it for M-FALCON serving so
    # prefill/delta passes normalize identically to training.
    norm_seq_len: int = 0

    @property
    def alpha(self) -> float:
        return self.attn_alpha or 1.0 / (self.attention_dim**0.5)


class KVCache(NamedTuple):
    """Padded KV cache for one STU layer (`stu.py:83-131` analogue)."""

    k: jax.Array  # [B, Nc, H, D]
    v: jax.Array  # [B, Nc, H, V]
    lengths: jax.Array  # int[B] — valid prefix per row


class STULayer(nn.Module):
    """One production HSTU block over padded-dense [B, N, D]."""

    config: STULayerConfig

    def setup(self) -> None:
        cfg = self.config
        D = cfg.embedding_dim
        H, h, a = cfg.num_heads, cfg.hidden_dim, cfg.attention_dim
        self._uvqk_weight = self.param(
            "uvqk_weight", nn.initializers.xavier_uniform(), (D, (2 * h + 2 * a) * H)
        )
        self._uvqk_beta = self.param(
            "uvqk_beta", nn.initializers.zeros, ((2 * h + 2 * a) * H,)
        )
        self._input_norm_weight = self.param(
            "input_norm_weight", nn.initializers.ones, (D,)
        )
        self._input_norm_bias = self.param(
            "input_norm_bias", nn.initializers.zeros, (D,)
        )
        # concat_ux=True => output weight is [3*h*H, D] (`stu.py:227-233`)
        self._output_weight = self.param(
            "output_weight", nn.initializers.xavier_uniform(), (h * H * 3, D)
        )
        norm_shape = H if cfg.use_group_norm else h * H
        self._output_norm_weight = self.param(
            "output_norm_weight", nn.initializers.ones, (norm_shape,)
        )
        self._output_norm_bias = self.param(
            "output_norm_bias", nn.initializers.zeros, (norm_shape,)
        )

    def _uqvk(self, x: jax.Array):
        cfg = self.config
        return hstu_compute_uqvk(
            x,
            self._input_norm_weight,
            self._input_norm_bias,
            self._uvqk_weight,
            self._uvqk_beta,
            num_heads=cfg.num_heads,
            attn_dim=cfg.attention_dim,
            hidden_dim=cfg.hidden_dim,
        )

    def _output(
        self, attn: jax.Array, u: jax.Array, x: jax.Array, deterministic: bool
    ) -> jax.Array:
        cfg = self.config
        rng = None
        if not deterministic and cfg.output_dropout_ratio > 0.0:
            rng = self.make_rng("dropout")
        return hstu_compute_output(
            attn, u, x,
            self._output_norm_weight,
            self._output_norm_bias,
            self._output_weight,
            num_heads=cfg.num_heads,
            linear_dim=cfg.hidden_dim,
            dropout_ratio=cfg.output_dropout_ratio,
            dropout_rng=rng,
            training=not deterministic,
            concat_ux=True,
            group_norm=cfg.use_group_norm,
        )

    def __call__(
        self,
        x: jax.Array,  # [B, N, D]
        lengths: jax.Array,  # int[B]
        num_targets: Optional[jax.Array] = None,  # int[B]
        deterministic: bool = False,
        kv_caching_lengths: Optional[jax.Array] = None,  # int[B]: prefill
    ):
        """Full forward (`stu.py:291-352`). Returns x_out, or
        (x_out, KVCache) when ``kv_caching_lengths`` is given (prefill)."""
        cfg = self.config
        B, N, _ = x.shape
        norm_len = cfg.norm_seq_len or N
        u, q, k, v = self._uqvk(x)
        nt = num_targets if cfg.target_aware else None
        attn_kernel = cfg.attn_kernel
        if attn_kernel == "auto":
            attn_kernel = "pallas" if N >= 512 else "xla"
        if attn_kernel == "pallas":
            from generative_recommenders_tpu.ops.pallas.hstu_attention import (
                hstu_mha_dense_pallas,
            )

            attn = hstu_mha_dense_pallas(
                q, k, v, lengths=lengths, alpha=cfg.alpha,
                max_seq_len=norm_len,
                causal=cfg.causal, num_targets=nt,
                max_attn_len=cfg.max_attn_len,
                contextual_seq_len=cfg.contextual_seq_len,
            )
        else:
            mask = apply_padding_guard(
                make_valid_attn_mask(
                    N, lengths, causal=cfg.causal, num_targets=nt,
                    max_attn_len=cfg.max_attn_len,
                    contextual_seq_len=cfg.contextual_seq_len,
                ),
                lengths,
            )
            attn = hstu_mha_dense(
                q, k, v, alpha=cfg.alpha, max_seq_len=norm_len, mask=mask
            )
        attn = attn.reshape(B, N, cfg.num_heads * cfg.hidden_dim)
        # saved under STUStack's remat policy: the Triton recompute flags
        # never re-run attention in backward — y/uvqk/normed_x are
        # recomputed FROM the saved attention output
        attn = checkpoint_name(attn, "stu_attn")
        out = self._output(attn, u, x, deterministic)
        if kv_caching_lengths is not None:
            # prefill: cache only the first kv_caching_lengths[b] positions
            keep = (
                jnp.arange(N, dtype=jnp.int32)[None, :]
                < kv_caching_lengths[:, None]
            )
            cache = KVCache(
                k=k * keep[:, :, None, None].astype(k.dtype),
                v=v * keep[:, :, None, None].astype(v.dtype),
                lengths=kv_caching_lengths.astype(jnp.int32),
            )
            return out, cache
        return out

    def cached_forward(
        self,
        delta_x: jax.Array,  # [B, M, D] — the M newest tokens per row
        cache: KVCache,
        num_targets: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, KVCache]:
        """M-FALCON incremental path (`stu.py:354-418`): delta uqvk →
        append to cache K/V → delta attention → output. Returns
        (delta_out [B, M, D], extended KVCache)."""
        cfg = self.config
        B, M, _ = delta_x.shape
        delta_u, delta_q, delta_k, delta_v = self._uqvk(delta_x)
        Nc = cache.k.shape[1]
        pad = [(0, 0), (0, M), (0, 0), (0, 0)]
        full_k, full_v = jnp.pad(cache.k, pad), jnp.pad(cache.v, pad)
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        cols = cache.lengths[:, None] + jnp.arange(M, dtype=jnp.int32)[None, :]
        full_k = full_k.at[rows, cols].set(delta_k.astype(full_k.dtype))
        full_v = full_v.at[rows, cols].set(delta_v.astype(full_v.dtype))
        full_lengths = cache.lengths + M
        nt = num_targets if cfg.target_aware else None
        delta_attn = delta_hstu_mha(
            delta_q, full_k, full_v, full_lengths,
            alpha=cfg.alpha, num_targets=nt,
            max_attn_len=cfg.max_attn_len,
            contextual_seq_len=cfg.contextual_seq_len,
            # silu normalizer must match the prefill forward's
            # (config constant, else cache capacity — not Nc+M headroom)
            norm_len=cfg.norm_seq_len or Nc,
            kernel=cfg.attn_kernel,
        ).reshape(B, M, cfg.num_heads * cfg.hidden_dim)
        out = self._output(delta_attn, delta_u, delta_x, deterministic)
        return out, KVCache(k=full_k, v=full_v, lengths=full_lengths)


class STUStack(nn.Module):
    """`modules/stu.py:421-466`. Optional dynamic wrappers
    (`modules/dynamic_stu.py`): ``stochastic_depth_ratio`` wraps every layer
    in SDSTU; ``l2_max_len`` wraps the top half of the stack in L2STU (the
    paper's upper-layer window trick). Wrapped stacks do not support the
    KV-cache prefill/cached_forward path."""

    configs: Tuple[STULayerConfig, ...]
    stochastic_depth_ratio: float = 0.0
    l2_max_len: int = 0

    def setup(self) -> None:
        from generative_recommenders_tpu.modules.dynamic_stu import (
            L2STU,
            SDSTU,
        )

        layers = []
        n = len(self.configs)
        for i, cfg in enumerate(self.configs):
            is_l2 = self.l2_max_len > 0 and i >= n // 2
            if is_l2:
                # the L2 window excludes the contextual prefix, so the inner
                # layer must not re-apply contextual masking
                inner_cfg = dataclasses.replace(cfg, contextual_seq_len=0)
            else:
                inner_cfg = cfg
            flags = (
                (inner_cfg.recompute_normed_x, "stu_normed_x"),
                (inner_cfg.recompute_uvqk, "stu_uvqk"),
                (inner_cfg.recompute_y, "stu_y"),
            )
            if any(flag for flag, _ in flags):
                # save the attention output + every non-flagged intermediate;
                # flagged ones are rematerialized in backward (the Triton
                # fused-bwd recompute semantics,
                # `triton_hstu_preprocess_and_attention.py:112-118`)
                saved = ["stu_attn"] + [
                    name for flag, name in flags if not flag
                ]
                layer_cls = nn.remat(
                    STULayer,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        *saved
                    ),
                    static_argnums=(4,),  # deterministic
                )
            else:
                layer_cls = STULayer
            layer = layer_cls(inner_cfg, name=f"layer_{i}")
            if self.stochastic_depth_ratio > 0.0:
                layer = SDSTU(
                    layer, self.stochastic_depth_ratio, name=f"sd_{i}"
                )
            if is_l2:
                layer = L2STU(
                    layer, self.l2_max_len,
                    cfg.contextual_seq_len, name=f"l2_{i}",
                )
            layers.append(layer)
        self.layers = layers
        self._dynamic = self.stochastic_depth_ratio > 0.0 or self.l2_max_len > 0

    def __call__(
        self,
        x: jax.Array,
        lengths: jax.Array,
        num_targets: Optional[jax.Array] = None,
        deterministic: bool = False,
        kv_caching_lengths: Optional[jax.Array] = None,
    ):
        caches: List[KVCache] = []
        for layer in self.layers:
            if kv_caching_lengths is not None:
                assert not self._dynamic, (
                    "dynamic STU wrappers do not support KV-cache prefill"
                )
                x, cache = layer(
                    x, lengths, num_targets, deterministic, kv_caching_lengths
                )
                caches.append(cache)
            else:
                x = layer(x, lengths, num_targets, deterministic)
        if kv_caching_lengths is not None:
            return x, caches
        return x

    def cached_forward(
        self,
        delta_x: jax.Array,
        caches: List[KVCache],
        num_targets: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, List[KVCache]]:
        new_caches: List[KVCache] = []
        for layer, cache in zip(self.layers, caches):
            delta_x, new_cache = layer.cached_forward(
                delta_x, cache, num_targets, deterministic
            )
            new_caches.append(new_cache)
        return delta_x, new_caches
