"""HSTU fused compute ops (padded-dense layout, XLA).

TPU twins of `ops/hstu_compute.py:50-171` (hstu_compute_uqvk /
hstu_compute_output / hstu_preprocess_and_attention) with eager semantics
from `ops/pytorch/pt_hstu_linear.py:23-99` and the delta-attention spec from
`ops/pytorch/pt_hstu_attention.py:175-235`.

The reference dispatches between 4 kernel backends (HammerKernel); on TPU the
uqvk projection and the norm·u·dropout+addmm epilogue are single fused XLA
HLO chains (matmul + elementwise fuse on the MXU/VPU automatically), so no
hand-written kernel is needed — the only Pallas kernel is the attention
itself. Layout is [B, N, D] padded-dense; jaggedness lives in `lengths`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from generative_recommenders_tpu.ops.attention_mask import (
    make_delta_attn_mask,
    make_valid_attn_mask,
)
from generative_recommenders_tpu.ops.normalization import layer_norm


def hstu_compute_uqvk(
    x: jax.Array,  # [B, N, D] (or [B, M, D] for delta tokens)
    norm_weight: jax.Array,  # [D]
    norm_bias: jax.Array,  # [D]
    uvqk_weight: jax.Array,  # [D, (2*hidden + 2*attn) * H]
    uvqk_bias: jax.Array,  # [(2*hidden + 2*attn) * H]
    *,
    num_heads: int,
    attn_dim: int,
    hidden_dim: int,
    norm_eps: float = 1e-6,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (u [B,N,H*hidden], q, k [B,N,H,attn], v [B,N,H,hidden]).

    Semantics: `ops/hstu_compute.py:50-90` — LN(x) @ W + b, split
    [u, v, q, k], silu(u) (q/k/v stay linear; silu on scores happens in
    attention).
    """
    B, N, _ = x.shape
    normed_x = layer_norm(
        x, weight=norm_weight, bias=norm_bias, eps=norm_eps
    )
    # checkpoint_name tags make the STULayerConfig.recompute_* flags real:
    # under STUStack's nn.remat policy the named values are recomputed in
    # backward instead of saved (reference recompute flags,
    # `triton_hstu_preprocess_and_attention.py:112-118`)
    normed_x = checkpoint_name(normed_x, "stu_normed_x")
    uvqk = (
        jnp.einsum(
            "bnd,de->bne", normed_x, uvqk_weight,
            preferred_element_type=jnp.float32,
        )
        + uvqk_bias
    ).astype(x.dtype)
    uvqk = checkpoint_name(uvqk, "stu_uvqk")
    h, a = hidden_dim * num_heads, attn_dim * num_heads
    u, v, q, k = jnp.split(uvqk, [h, 2 * h, 2 * h + a], axis=-1)
    u = jax.nn.silu(u)
    q = q.reshape(B, N, num_heads, attn_dim)
    k = k.reshape(B, N, num_heads, attn_dim)
    v = v.reshape(B, N, num_heads, hidden_dim)
    return u, q, k, v


def norm_mul_dropout(
    attn: jax.Array,  # [B, N, H*hidden]
    u: jax.Array,  # [B, N, H*hidden]
    weight: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-6,
    dropout_ratio: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    training: bool = False,
    concat_ux: bool = False,
    group_norm: bool = False,
    num_heads: int = 1,
    linear_dim: int = -1,
) -> jax.Array:
    """`pt_hstu_linear.py:23-66`: y = u * norm(attn); concat_ux ->
    cat([u, attn, y]); dropout."""
    dtype = attn.dtype
    x32 = attn.astype(jnp.float32)
    u32 = u.astype(jnp.float32)
    if group_norm:
        B, N, _ = x32.shape
        g = x32.reshape(B, N, num_heads, linear_dim)
        mean = jnp.mean(g, axis=-1, keepdims=True)
        var = jnp.var(g, axis=-1, keepdims=True)
        g = (g - mean) * jax.lax.rsqrt(var + eps)
        g = g * weight.astype(jnp.float32).reshape(1, 1, num_heads, 1)
        g = g + bias.astype(jnp.float32).reshape(1, 1, num_heads, 1)
        y = u32 * g.reshape(B, N, num_heads * linear_dim)
    else:
        y = u32 * layer_norm(
            x32,
            weight=weight.astype(jnp.float32),
            bias=bias.astype(jnp.float32),
            eps=eps,
        )
    if concat_ux:
        y = jnp.concatenate([u32, x32, y], axis=-1)
    if training and dropout_ratio > 0.0:
        assert dropout_rng is not None
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_ratio, y.shape)
        y = jnp.where(keep, y / (1.0 - dropout_ratio), 0.0)
    return checkpoint_name(y.astype(dtype), "stu_y")


def hstu_compute_output(
    attn: jax.Array,  # [B, N, H*hidden]
    u: jax.Array,  # [B, N, H*hidden]
    x: jax.Array,  # [B, N, D] (residual)
    norm_weight: jax.Array,
    norm_bias: jax.Array,
    output_weight: jax.Array,  # [H*hidden*(3 if concat_ux else 1), D]
    *,
    num_heads: int,
    linear_dim: int,
    norm_eps: float = 1e-6,
    dropout_ratio: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    training: bool = False,
    concat_ux: bool = True,
    group_norm: bool = False,
) -> jax.Array:
    """`ops/hstu_compute.py:92-171` / `pt_hstu_linear.py:68-99`:
    x + norm_mul_dropout(attn, u) @ W_o  (residual fused like torch.addmm)."""
    y = norm_mul_dropout(
        attn, u, norm_weight, norm_bias,
        eps=norm_eps, dropout_ratio=dropout_ratio, dropout_rng=dropout_rng,
        training=training, concat_ux=concat_ux, group_norm=group_norm,
        num_heads=num_heads, linear_dim=linear_dim,
    )
    out = x + jnp.einsum(
        "bnf,fd->bnd", y, output_weight.astype(y.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return out


def delta_hstu_mha(
    delta_q: jax.Array,  # [B, M, H, D] — queries for the M newest tokens
    k: jax.Array,  # [B, N, H, D] — full (cache + delta) keys, padded
    v: jax.Array,  # [B, N, H, V]
    seq_lengths: jax.Array,  # int[B] — full valid length per row (<= N)
    *,
    alpha: float,
    num_targets: Optional[jax.Array] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    norm_len: Optional[int] = None,
    kernel: str = "xla",  # "xla" | "pallas" | "auto"
) -> jax.Array:
    """Delta-q attention over full K/V (`pt_hstu_attention.py:175-235`,
    `ops/hstu_attention.py:131`): the M delta queries sit at positions
    [length - M, length) of each row; mask rows are sliced accordingly.
    ``norm_len`` is the silu normalizer (the reference's ``max_seq_len``
    argument); it must match the one the full/prefill forward used —
    defaults to the padded K length. Returns [B, M, H, V].

    ``kernel="pallas"`` routes to the resident-KV cached-decode kernel
    (`ops/pallas/hstu_attention.py:delta_hstu_mha_pallas`, the Triton
    `triton_cached_hstu_mha` twin) which walks only each row's live KV
    chunks; "auto" picks it on TPU at N >= 512 when the geometry fits."""
    B, M, H, D = delta_q.shape
    N = k.shape[1]
    if kernel != "xla":
        from generative_recommenders_tpu.ops.pallas.hstu_attention import (
            delta_hstu_mha_pallas,
            delta_pallas_supported,
        )

        fits = delta_pallas_supported(H, N, D, v.shape[-1], k.dtype.itemsize)
        use_pallas = fits if kernel == "pallas" else (
            fits and N >= 512 and jax.devices()[0].platform == "tpu"
        )
        if use_pallas:
            return delta_hstu_mha_pallas(
                delta_q, k, v, seq_lengths,
                alpha=alpha, num_targets=num_targets,
                max_attn_len=max_attn_len,
                contextual_seq_len=contextual_seq_len,
                norm_len=norm_len,
            )
    qk = jnp.einsum(
        "bmhd,bnhd->bhmn", delta_q, k, preferred_element_type=jnp.float32
    ) * alpha
    p = jax.nn.silu(qk) / (norm_len or N)
    # delta rows sit at positions [length - M, length); compute just those
    # mask rows directly ([B, M, N]) instead of materializing [B, N, N]
    row_idx = (seq_lengths[:, None] - M + jnp.arange(M)[None, :]).astype(
        jnp.int32
    )  # [B, M]
    row_idx = jnp.clip(row_idx, 0, N - 1)
    delta_mask = make_delta_attn_mask(
        N,
        seq_lengths,
        row_idx,
        causal=True,
        num_targets=num_targets,
        max_attn_len=max_attn_len,
        contextual_seq_len=contextual_seq_len,
    )
    p = p * delta_mask[:, None, :, :].astype(p.dtype)
    out = jnp.einsum(
        "bhmn,bnhv->bmhv", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)
