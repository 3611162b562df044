"""Flash HSTU attention with IN-KERNEL relative attention bias (fwd + bwd).

BEYOND-REFERENCE scope: the reference has no bias-fused attention kernel —
its research stack materializes the full [B, N, N] bias on the host model
side (`research/modeling/sequential/hstu.py:87-147`,
RelativeBucketedTimeAndPositionBasedBias) and feeds it to a generic
attention. This kernel fuses that bias into the flash attention tiles so it
is never materialized. Semantics source (what must match bit-for-bit up to
tiling):

    bias[b, i, j] = pos_w[j - i + Nm - 1]
                  + ts_w[clip(floor(log(max(|ts[b, i+1] - ts[b, j]|, 1))
                               / 0.301), 0, NB)]
    out = (silu(alpha * q k^T + bias) / max_seq_len) * valid_mask @ v

The XLA fallback materializes the bias as a [B, N, N] f32 tensor (134 MB per
layer invocation at B=128, N=512). These kernels never materialize it: each
[bq, bk] tile recomputes its own bias from two tiny resident tables
(pos_w: [2*Nm-1], ts_w: [NB+1]) and the per-row timestamps.

TPU realization of the per-tile table lookups (Triton's scattered `tl.load`
has no TPU equivalent):

  * gathers ride `tpu.dynamic_gather` (exposed as `jnp.take_along_axis` on
    same-shaped 2-D operands — the in-register lane shuffle). The ts table
    (<= 129 entries) broadcasts into one 128-lane row + an overflow select;
    the pos window of a tile spans <= bq+bk-1 consecutive entries, i.e. a
    handful of 128-entry blocks, each one lane-gather + select.
  * backward ts_w scatter: a dynamic-range `fori_loop` over only the bucket
    values PRESENT in the tile (timestamps are near-sorted, so a tile spans
    few log-buckets), each a masked full-tile reduction accumulated into a
    [1, 128*ceil((NB+1)/128)] VMEM scratch.
  * backward pos_w scatter: the per-diagonal sums of ds. Rows are sheared by
    their row index via lane-gathers (per-row roll = dynamic_gather with a
    rolled iota), aligning diagonals into columns; a ones-vector matmul on
    the MXU then reduces over rows, and the [bq+bk-1] result accumulates
    into a guarded VMEM scratch window at the tile's diagonal offset.

Both grad scratches persist across the whole (B, n_kv) grid (sequential
semantics) and flush to dedicated outputs at the last step, so the only HLO
tensors are O(N) or O(table) — never O(B*N^2).

Architecture is resident-KV only (grid (B, n_q) forward / (B, n_kv) fused
backward, full rows resident in VMEM) — rel-bias models are the research
stack whose N (<= ~4k) always fits; `relbias_pallas_supported` gates the
dispatch, falling back to the XLA composite otherwise.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from generative_recommenders_tpu.ops.pallas.hstu_attention import (
    _block_mask,
    _cdiv,
    _interpret_default,
    _pack_rows,
    _sigmoid,
    _silu,
    _unpack_rows,
    _use_resident,
)

_INV_LOG_BASE = 1.0 / 0.301  # bucket(x) = floor(ln(x) / 0.301)

# the rel-bias kernels have no 3-D-grid fallback, so give them most of the
# chip's 128 MB VMEM instead of Mosaic's conservative 16 MB scoped default
# (measured: the bwd at B128/H8/N640/D32/f32 — the ml-20m preset at
# seq_len 512 — needs 22.5 MB of scoped VMEM and compiles + runs fine once
# the limit is raised); relbias_pallas_supported() gates shapes that would
# exceed even this.
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
_RELBIAS_BWD_EST_LIMIT = 8 * 1024 * 1024  # row-estimate ceiling, see gate


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lane_gather(row: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather ``row[idx]`` with idx values in [0, 128).

    row: [1, 128]; idx: int32 [R, C] with C a multiple of 128. Lowers to
    `tpu.dynamic_gather` along lanes per 128-column chunk.
    """
    R, C = idx.shape
    outs = []
    for cc in range(C // 128):
        chunk = idx[:, cc * 128 : (cc + 1) * 128]
        tab = jnp.broadcast_to(row, (R, 128))
        outs.append(jnp.take_along_axis(tab, chunk, axis=1))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _pos_bias_tile(
    pos_rows_ref,  # [n_rows, 128] f32 — pos_w padded/reshaped, resident
    row0: jax.Array,  # scalar int32
    col0: jax.Array,
    bq: int,
    bk: int,
    table_len: int,  # 2*Nm - 1
) -> jax.Array:
    """[bq, bk] f32: pos_w[clip(col - row + Nm - 1, 0, 2Nm-2)].

    Per 128-column chunk the (clipped) indices span bq+127 consecutive
    values = at most bq//128 + 2 distinct 128-blocks of the table; each is
    one dynamic sublane slice + lane-gather, combined by hi-block selects.
    Out-of-range indices only occur on dead (masked) elements — they read a
    clamped row, never out of bounds.
    """
    nm_off = (table_len - 1) // 2 + 1 - 1  # Nm - 1
    n_rows = pos_rows_ref.shape[0]
    riota = jax.lax.broadcasted_iota(jnp.int32, (bq, 128), 0)
    citer = jax.lax.broadcasted_iota(jnp.int32, (bq, 128), 1)
    n_hi = bq // 128 + 2
    outs = []
    for cc in range(bk // 128):
        base = col0 + cc * 128 - row0 + nm_off
        rel = jnp.clip(base + citer - riota, 0, table_len - 1)
        hi = jnp.right_shift(rel, 7)
        lo = jnp.bitwise_and(rel, 127)
        # lowest hi-block present in this chunk (clipped rel is monotone in
        # the clip bounds, so min over the chunk = clip of the raw min)
        h_lo = jnp.right_shift(
            jnp.clip(base - (bq - 1), 0, table_len - 1), 7
        )
        acc = jnp.zeros((bq, 128), jnp.float32)
        for m in range(n_hi):
            h = h_lo + m
            row = pos_rows_ref[pl.ds(jnp.minimum(h, n_rows - 1), 1), :]
            g = _lane_gather(row, lo)
            acc = jnp.where(hi == h, g, acc)
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _ts_bucket_tile(
    tsq_col: jax.Array,  # [bq, 1] f32 — query-side timestamps ts[b, i+1]
    ts_row: jax.Array,  # [1, bk] f32 — key-side timestamps ts[b, j]
    num_buckets: int,
) -> jax.Array:
    """int32 [bq, bk]: clip(floor(ln(max(|dt|, 1)) / 0.301), 0, NB)."""
    dt = tsq_col - ts_row
    y = jnp.floor(
        jnp.log(jnp.maximum(jnp.abs(dt), 1.0)) * _INV_LOG_BASE
    )
    return jnp.clip(y, 0.0, float(num_buckets)).astype(jnp.int32)


def _ts_bias_tile(
    ts_row_ref,  # [1, 128] f32 — first 128 ts_w entries
    ts_last: jax.Array,  # scalar f32 — entry 128 (only used when NB == 128)
    bucket: jax.Array,  # int32 [bq, bk]
    num_buckets: int,
) -> jax.Array:
    g = _lane_gather(ts_row_ref[...], jnp.minimum(bucket, 127))
    if num_buckets >= 128:
        g = jnp.where(bucket >= 128, ts_last, g)
    return g


# =============================================================== forward ====


def _fwd_kernel_relbias(
    lengths_ref,  # int32[B] (scalar prefetch)
    num_targets_ref,  # int32[B]
    q_ref,  # [1, H, BQ, D]
    k_ref,  # [1, H, N, D]  (full row resident)
    v_ref,  # [1, H, N, V]
    tsq_ref,  # [1, BQ, 1] f32 — query-side ts (ts shifted by one)
    tsc_ref,  # [1, 1, N] f32 — key-side ts, full row resident (the leading
    #          singleton keeps the block's last-two dims Mosaic-legal)
    pos_rows_ref,  # [n_pos_rows, 128] f32
    ts_w_ref,  # [2, 128] f32 (row 1 lane 0 = entry 128)
    o_ref,  # [1, H, BQ, V]
    acc_ref,  # scratch [H, BQ, V] f32
    *,
    bq: int,
    bk: int,
    alpha: float,
    inv_norm: float,
    pos_table_len: int,
    num_buckets: int,
    causal: bool,
    max_attn_len: int,
    contextual_seq_len: int,
    min_full_attn_seq_len: int,
    has_targets: bool = True,
):
    b, iq = pl.program_id(0), pl.program_id(1)
    H = q_ref.shape[1]
    length = lengths_ref[b]
    num_targets = num_targets_ref[b]
    row0 = iq * bq

    acc_ref[...] = jnp.zeros_like(acc_ref)

    kv_limit = length
    if causal and contextual_seq_len == 0:
        kv_limit = jnp.minimum(kv_limit, row0 + bq)

    @pl.when(row0 < length)
    def _compute():
        n_live = pl.cdiv(kv_limit, bk)
        tsq_col = tsq_ref[0]  # [bq, 1]
        ts_last = ts_w_ref[1, 0]

        def body(j, carry):
            col0 = j * bk
            mask = _block_mask(
                row0, col0, bq, bk, length, num_targets, causal,
                max_attn_len, contextual_seq_len, min_full_attn_seq_len,
                has_targets=has_targets,
            )
            ts_row = tsc_ref[0, :, pl.ds(col0, bk)]  # [1, bk]
            bucket = _ts_bucket_tile(tsq_col, ts_row, num_buckets)
            bias = _pos_bias_tile(
                pos_rows_ref, row0, col0, bq, bk, pos_table_len
            ) + _ts_bias_tile(
                ts_w_ref[pl.ds(0, 1), :], ts_last, bucket, num_buckets
            )
            for h in range(H):
                kb = k_ref[0, h, pl.ds(col0, bk)]
                vb = v_ref[0, h, pl.ds(col0, bk)]
                # alpha rides the [bq, D] q tile; inv_norm the acc flush
                qb = q_ref[0, h] if alpha == 1.0 else q_ref[0, h] * alpha
                s = jax.lax.dot_general(
                    qb, kb,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias
                p = jnp.where(mask, _silu(s), 0.0)
                acc_ref[h] += jax.lax.dot_general(
                    p.astype(vb.dtype), vb,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return carry

        jax.lax.fori_loop(0, n_live, body, 0, unroll=False)

    o_ref[0] = (acc_ref[...] * inv_norm).astype(o_ref.dtype)


# ============================================================== backward ====


def _diag_sums(ds: jax.Array, bq: int, bk: int) -> jax.Array:
    """[1, Lp] f32 with entry s = sum of ds over the diagonal
    c - r + (bq - 1) = s  (Lp = bq + bk - 1 rounded up to 128).

    Shear rows into diagonal-aligned columns with per-row lane rolls
    (dynamic_gather on a rolled iota), then reduce over rows with a
    ones-vector MXU matmul.
    """
    L = bq + bk - 1
    Lp = _round_up(L, 128)
    riota = jax.lax.broadcasted_iota(jnp.int32, (bq, 128), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (bq, 128), 1)
    ones = jnp.ones((1, bq), jnp.float32)
    out_chunks = []
    for oc in range(Lp // 128):
        al = jnp.zeros((bq, 128), jnp.float32)
        # source col for output lane l, row r: c = oc*128 + l - (bq-1) + r
        s_min = oc * 128 - (bq - 1)
        s_max = oc * 128 + 127 + (bq - 1)
        sc_lo = max(0, s_min // 128)
        sc_hi = min((bk - 1) // 128, s_max // 128)
        for sc in range(sc_lo, sc_hi + 1):
            src = s_min + liota + riota  # global source col per (r, l)
            valid = jnp.logical_and(src >= sc * 128, src < (sc + 1) * 128)
            # (src mod 128) with a positive bias so the & stays in range
            idx = jnp.bitwise_and(src + (bq // 128 + 2) * 128, 127)
            chunk = ds[:, sc * 128 : (sc + 1) * 128]
            g = jnp.take_along_axis(chunk, idx, axis=1)
            al = jnp.where(valid, g, al)
        out_chunks.append(
            jax.lax.dot_general(
                ones, al, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return (
        out_chunks[0]
        if len(out_chunks) == 1
        else jnp.concatenate(out_chunks, axis=1)
    )


def _bwd_kernel_relbias(
    lengths_ref, num_targets_ref,
    q_ref, k_ref, v_ref, do_ref,  # k/v tiles at j; q/do full rows resident
    tsq_ref,  # [1, N, 1] f32 — full row resident (rows vary in inner loop)
    tsc_ref,  # [1, 1, BK] f32 — this kv tile's key-side ts
    pos_rows_ref, ts_w_ref,
    dq_ref, dk_ref, dv_ref, dpos_ref, dts_ref,
    dq_acc, dk_acc, dv_acc, dpos_acc, dts_acc,
    *, bq, bk, n_kv, n_b, alpha, inv_norm, pos_table_len, num_buckets,
    causal, max_attn_len, contextual_seq_len,
    min_full_attn_seq_len, has_targets=True,
):
    """Fused backward with bias-table gradients: grid (B, n_kv); per kv tile
    j the inner dynamic loop walks live q blocks, recomputing S (with bias)
    once and producing dk_j, dv_j, the dq contributions, AND the ds-scatter
    into the dpos/dts scratches (ds IS the bias cotangent)."""
    b, j = pl.program_id(0), pl.program_id(1)
    H = k_ref.shape[1]
    length = lengths_ref[b]
    num_targets = num_targets_ref[b]
    col0 = j * bk
    nb_pad = dts_acc.shape[1]
    Lp = _round_up(bq + bk - 1, 128)

    @pl.when(j == 0)
    def _init_dq():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _init_tables():
        dpos_acc[...] = jnp.zeros_like(dpos_acc)
        dts_acc[...] = jnp.zeros_like(dts_acc)

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(col0 < length)
    def _compute():
        if causal and contextual_seq_len == 0:
            i_first = col0 // bq
        else:
            i_first = 0
        n_q_live = pl.cdiv(length, bq)
        ts_row = tsc_ref[0]  # [1, bk]
        ts_last = ts_w_ref[1, 0]
        iota_nb = jax.lax.broadcasted_iota(jnp.int32, (1, nb_pad), 1)

        def body(i, carry):
            row0 = i * bq
            mask = _block_mask(
                row0, col0, bq, bk, length, num_targets, causal,
                max_attn_len, contextual_seq_len, min_full_attn_seq_len,
                has_targets=has_targets,
            )
            tsq_col = tsq_ref[0, pl.ds(row0, bq), :]  # [bq, 1]
            bucket = _ts_bucket_tile(tsq_col, ts_row, num_buckets)
            bias = _pos_bias_tile(
                pos_rows_ref, row0, col0, bq, bk, pos_table_len
            ) + _ts_bias_tile(
                ts_w_ref[pl.ds(0, 1), :], ts_last, bucket, num_buckets
            )
            ds_sum = jnp.zeros((bq, bk), jnp.float32)
            # alpha rides the [bq, D] q tile and inv_norm the [bq, V] do
            # tile: s is unchanged, ds carries inv_norm through dp, so
            # dk/dv land exactly and the bias cotangent (ds_sum ->
            # dpos/dts) is exact; dq takes one *alpha at the flush
            for h in range(H):
                qb = q_ref[0, h, pl.ds(row0, bq)]
                if alpha != 1.0:
                    qb = qb * alpha
                dob = do_ref[0, h, pl.ds(row0, bq)] * inv_norm
                s = jax.lax.dot_general(
                    qb, k_ref[0, h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias
                sig = _sigmoid(s)  # shared by p and dsilu
                p = jnp.where(mask, s * sig, 0.0)
                dv_acc[h] += jax.lax.dot_general(
                    p.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    dob, v_ref[0, h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dsilu = sig * (1.0 + s * (1.0 - sig))
                ds = jnp.where(mask, dp * dsilu, 0.0)
                ds_sum += ds
                ds16 = ds.astype(qb.dtype)
                dk_acc[h] += jax.lax.dot_general(
                    ds16, qb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dq_acc[h, pl.ds(row0, bq)] += jax.lax.dot_general(
                    ds16, k_ref[0, h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            # ---- bias-table cotangents (dbias tile = ds summed over heads)
            # ts_w: loop only the log-buckets PRESENT among live elements
            # (near-sorted timestamps => a tile spans few buckets)
            b_lo = jnp.min(jnp.where(mask, bucket, num_buckets))
            b_hi = jnp.max(jnp.where(mask, bucket, 0))

            def ts_body(t, carry2):
                contrib = jnp.sum(jnp.where(bucket == t, ds_sum, 0.0))
                dts_acc[...] += jnp.where(iota_nb == t, contrib, 0.0)
                return carry2

            jax.lax.fori_loop(b_lo, b_hi + 1, ts_body, 0, unroll=False)
            # pos_w: per-diagonal sums, accumulated into this tile's
            # diagonal-offset ROW of the scratch (dynamic indexing on the
            # batch dim is unconstrained; a dynamic LANE window offset is
            # rejected by Mosaic — "cannot statically prove multiple of
            # 128" — even when affine-provably aligned). The host
            # reconstructs dpos from the rows with one scatter-add.
            d = _diag_sums(ds_sum, bq, bk)  # [1, Lp]
            g_diag = math.gcd(bq, bk)
            N_tot = q_ref.shape[2]
            dd = (col0 - row0 + (N_tot - bq)) // g_diag
            dpos_acc[pl.ds(dd, 1), :, :] += d[None]
            return carry

        jax.lax.fori_loop(i_first, n_q_live, body, 0, unroll=False)

    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    @pl.when(j == n_kv - 1)
    def _write_dq():
        acc = dq_acc[...]
        if alpha != 1.0:
            acc = acc * alpha
        dq_ref[0] = acc.astype(dq_ref.dtype)

    @pl.when(jnp.logical_and(b == n_b - 1, j == n_kv - 1))
    def _write_tables():
        # full scratch out (the pos window extraction at the unaligned static
        # offset `pos_guard` happens on the host — Mosaic only accepts
        # 128-aligned lane offsets in-kernel)
        dpos_ref[...] = dpos_acc[...]
        dts_ref[...] = dts_acc[...]


# ========================================================== host wrappers ===


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha", "max_seq_len", "pos_table_len", "num_buckets", "causal",
        "max_attn_len", "contextual_seq_len", "min_full_attn_seq_len",
        "block_q", "block_k", "interpret", "has_targets",
    ),
)
def _relbias_bwd(
    q, k, v, lengths, num_targets, tsq, tsc, pos_rows, ts_w2, do,
    *, alpha, max_seq_len, pos_table_len, num_buckets, causal, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, block_q, block_k, interpret,
    has_targets=True,
):
    B, H, N, D = q.shape
    V = v.shape[-1]
    bq, bk = min(block_q, N), min(block_k, N)
    n_q, n_kv = _cdiv(N, bq), _cdiv(N, bk)
    Lp = _round_up(bq + bk - 1, 128)
    P_pad = pos_rows.shape[0] * 128
    # dpos is accumulated per diagonal-offset row (delta = col0 - row0, a
    # multiple of g = gcd(bq, bk)); the host scatter-adds the rows back into
    # the pos table layout below. This keeps every in-kernel dpos index on
    # the batch dim — Mosaic rejects dynamic lane-window offsets outright.
    g = math.gcd(bq, bk)
    n_diags = (2 * N - bq - bk) // g + 1
    nb_pad = 256  # always matches ts_w2's [2, 128] packing
    kernel = functools.partial(
        _bwd_kernel_relbias,
        bq=bq, bk=bk, n_kv=n_kv, n_b=B, alpha=alpha,
        inv_norm=1.0 / max_seq_len, pos_table_len=pos_table_len,
        num_buckets=num_buckets, causal=causal,
        max_attn_len=max_attn_len, contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
        has_targets=has_targets,
    )
    dq, dk, dv, dpos, dts = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_kv),
            in_specs=[
                pl.BlockSpec((1, H, N, D), lambda b, j, L, T: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, bk, D), lambda b, j, L, T: (b, 0, j, 0)),
                pl.BlockSpec((1, H, bk, V), lambda b, j, L, T: (b, 0, j, 0)),
                pl.BlockSpec((1, H, N, V), lambda b, j, L, T: (b, 0, 0, 0)),
                pl.BlockSpec((1, N, 1), lambda b, j, L, T: (b, 0, 0)),
                pl.BlockSpec((1, 1, bk), lambda b, j, L, T: (b, 0, j)),
                pl.BlockSpec(pos_rows.shape, lambda b, j, L, T: (0, 0)),
                pl.BlockSpec((2, 128), lambda b, j, L, T: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, H, N, D), lambda b, j, L, T: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, bk, D), lambda b, j, L, T: (b, 0, j, 0)),
                pl.BlockSpec((1, H, bk, V), lambda b, j, L, T: (b, 0, j, 0)),
                pl.BlockSpec(
                    (n_diags, 1, Lp), lambda b, j, L, T: (0, 0, 0)
                ),
                pl.BlockSpec((1, nb_pad), lambda b, j, L, T: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((H, N, D), jnp.float32),
                pltpu.VMEM((H, bk, D), jnp.float32),
                pltpu.VMEM((H, bk, V), jnp.float32),
                pltpu.VMEM((n_diags, 1, Lp), jnp.float32),
                pltpu.VMEM((1, nb_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, N, V), v.dtype),
            jax.ShapeDtypeStruct((n_diags, 1, Lp), jnp.float32),
            jax.ShapeDtypeStruct((1, nb_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), num_targets.astype(jnp.int32),
        q, k, v, do, tsq, tsc, pos_rows, ts_w2,
    )
    # reconstruct dpos from the per-diagonal rows: row dd, entry t carries
    # the ds-sum of the global diagonal delta = dd*g - (N - bq) at tile
    # lane t, i.e. pos index p = delta + t - (bq - 1) + (Nm - 1)
    rows = dpos.reshape(n_diags, Lp)
    nm = (pos_table_len - 1) // 2 + 1
    p = (
        jnp.arange(n_diags)[:, None] * g
        - (N - bq)
        + (nm - bq)
        + jnp.arange(Lp)[None, :]
    )
    valid = (p >= 0) & (p < P_pad)
    dpos = (
        jnp.zeros((P_pad,), jnp.float32)
        .at[jnp.where(valid, p, 0)]
        .add(jnp.where(valid, rows, 0.0))
    )[None]
    return dq, dk, dv, dpos, dts


# ============================================================ public API ====


def hstu_mha_dense_pallas_relbias(
    q: jax.Array,  # [B, N, H, D]
    k: jax.Array,
    v: jax.Array,  # [B, N, H, V]
    lengths: jax.Array,  # int[B]
    timestamps: jax.Array,  # [B, N] (int or float; full-length)
    pos_w: jax.Array,  # f32 [2*Nm - 1]
    ts_w: jax.Array,  # f32 [num_buckets + 1]
    *,
    alpha: float = 1.0,
    max_seq_len: Optional[int] = None,
    num_buckets: int = 128,
    causal: bool = True,
    num_targets: Optional[jax.Array] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    min_full_attn_seq_len: int = 0,
    block_q: int = 0,  # 0 = auto (factory table / measured per-shape cache)
    block_k: int = 0,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash HSTU attention with the relative position+time bias computed
    in-kernel (fwd + bwd). Differentiable in q, k, v, pos_w, ts_w.

    Semantics match the XLA composite
    `RelativeBucketedTimeAndPositionBasedBias` + `hstu_mha_dense(bias=...)`
    (`models/hstu.py:51-125`) without ever materializing [B, N, N].
    """
    assert num_buckets <= 128, "ts bucket table must fit one gather row + 1"
    B, N, H, D = q.shape
    V = v.shape[-1]
    if block_q == 0 or block_k == 0:
        from generative_recommenders_tpu.ops.pallas import autotune

        abq, abk = autotune.get_blocks("relbias", B, N, H, D, V, q.dtype)
        block_q, block_k = block_q or abq, block_k or abk
    if max_seq_len is None:
        max_seq_len = N
    if interpret is None:
        interpret = _interpret_default()
    table_len = pos_w.shape[0]
    assert table_len % 2 == 1, "pos_w must have 2*Nm-1 entries"
    Nm = (table_len + 1) // 2
    assert N <= Nm + 127, "runtime N beyond the pos table range"
    nt = (
        jnp.zeros((B,), jnp.int32)
        if num_targets is None
        else num_targets.astype(jnp.int32)
    )
    # pad N to a 128 multiple (gathers are lane-chunked); padded rows/cols
    # are beyond every length => masked dead. Measured: padding further to
    # 256-multiples cost the ml-3b shape ~16% (attn_tune_b.log), so the
    # relbias buckets stay on the 128 rule (autotune._bucket_n kind-aware)
    N_orig = N
    N_pad = (-N) % 128
    if N_pad:
        pad4 = ((0, 0), (0, N_pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad4), jnp.pad(k, pad4), jnp.pad(v, pad4)
        timestamps = jnp.pad(timestamps, ((0, 0), (0, N_pad)))
        N = N + N_pad
    bq, bk = min(block_q, N), min(block_k, N)
    while N % bq:
        bq //= 2
    while N % bk:
        bk //= 2
    assert bq >= 128 and bk >= 128, "relbias kernel needs 128-aligned blocks"

    ts = timestamps.astype(jnp.float32)
    # query-side ts: ext[:, 1:] with the last entry repeated, on the ORIGINAL
    # (unpadded) length — ts[b, min(i+1, N_orig-1)]
    idx_next = jnp.minimum(jnp.arange(N) + 1, N_orig - 1)
    tsq = jnp.take(ts, idx_next, axis=1)[:, :, None]  # [B, N, 1]
    # key-side ts carried as [B, 1, N]: a leading singleton so the kernels'
    # (1, 1, bk) blocks satisfy Mosaic's last-two-dims rule ([B, N] with a
    # (1, bk) block is rejected whenever B > 1)
    tsc3 = ts[:, None, :]

    # pack tables: pos_w -> [ceil/128, 128]; ts_w -> [2, 128]
    P_pad = _round_up(table_len, 128)
    pos_rows = jnp.pad(pos_w.astype(jnp.float32), (0, P_pad - table_len))
    pos_rows = pos_rows.reshape(P_pad // 128, 128)
    ts_pad = jnp.zeros((256,), jnp.float32)
    ts_pad = ts_pad.at[: num_buckets + 1].set(ts_w.astype(jnp.float32))
    ts_w2 = ts_pad.reshape(2, 128)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    statics = (
        alpha, max_seq_len, table_len, num_buckets, causal, max_attn_len,
        contextual_seq_len, min_full_attn_seq_len, bq, bk, interpret,
        num_targets is not None,
    )
    out = _relbias_call(
        qt, kt, vt, pos_rows, ts_w2, tsq, tsc3,
        lengths.astype(jnp.int32), nt, *statics
    )
    out = jnp.transpose(out, (0, 2, 1, 3))
    if N_pad:
        out = out[:, :N_orig]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=tuple(range(9, 21)))
def _relbias_call(
    qt, kt, vt, pos_rows, ts_w2, tsq, tsc, lengths, nt,
    alpha, max_seq_len, pos_table_len, num_buckets, causal, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, bq, bk, interpret,
    has_targets=True,
):
    return _relbias_fwd_entry(
        qt, kt, vt, pos_rows, ts_w2, tsq, tsc, lengths, nt,
        alpha, max_seq_len, pos_table_len, num_buckets, causal, max_attn_len,
        contextual_seq_len, min_full_attn_seq_len, bq, bk, interpret,
        has_targets,
    )


def _relbias_fwd_entry(
    qt, kt, vt, pos_rows, ts_w2, tsq, tsc, lengths, nt,
    alpha, max_seq_len, pos_table_len, num_buckets, causal, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, bq, bk, interpret,
    has_targets=True,
):
    kernel = functools.partial(
        _fwd_kernel_relbias,
        bq=bq, bk=bk, alpha=alpha, inv_norm=1.0 / max_seq_len,
        pos_table_len=pos_table_len, num_buckets=num_buckets,
        causal=causal, max_attn_len=max_attn_len,
        contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
        has_targets=has_targets,
    )
    B, H, N, D = qt.shape
    V = vt.shape[-1]
    n_q = _cdiv(N, bq)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_q),
            in_specs=[
                pl.BlockSpec((1, H, bq, D), lambda b, iq, L, T: (b, 0, iq, 0)),
                pl.BlockSpec((1, H, N, D), lambda b, iq, L, T: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, N, V), lambda b, iq, L, T: (b, 0, 0, 0)),
                pl.BlockSpec((1, bq, 1), lambda b, iq, L, T: (b, iq, 0)),
                pl.BlockSpec((1, 1, N), lambda b, iq, L, T: (b, 0, 0)),
                pl.BlockSpec(
                    (pos_rows.shape[0], 128), lambda b, iq, L, T: (0, 0)
                ),
                pl.BlockSpec((2, 128), lambda b, iq, L, T: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, H, bq, V), lambda b, iq, L, T: (b, 0, iq, 0)
            ),
            scratch_shapes=[pltpu.VMEM((H, bq, V), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, N, V), vt.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(lengths, nt, qt, kt, vt, tsq, tsc, pos_rows, ts_w2)


def _relbias_vjp_fwd(
    qt, kt, vt, pos_rows, ts_w2, tsq, tsc, lengths, nt, *statics
):
    out = _relbias_fwd_entry(
        qt, kt, vt, pos_rows, ts_w2, tsq, tsc, lengths, nt, *statics
    )
    return out, (
        _pack_rows(qt), _pack_rows(kt), _pack_rows(vt),
        pos_rows, ts_w2, tsq, tsc, lengths, nt,
    )


def _relbias_vjp_bwd(
    alpha, max_seq_len, pos_table_len, num_buckets, causal, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, bq, bk, interpret,
    has_targets, residuals, do,
):
    (qp, kp, vp, pos_rows, ts_w2, tsq, tsc, lengths, nt) = residuals
    H = do.shape[1]  # do is the [B, H, N, V] cotangent of out
    qt, kt, vt = _unpack_rows(qp, H), _unpack_rows(kp, H), _unpack_rows(vp, H)
    dq, dk, dv, dpos, dts = _relbias_bwd(
        qt, kt, vt, lengths, nt, tsq, tsc, pos_rows, ts_w2, do,
        alpha=alpha, max_seq_len=max_seq_len, pos_table_len=pos_table_len,
        num_buckets=num_buckets, causal=causal, max_attn_len=max_attn_len,
        contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
        block_q=bq, block_k=bk, interpret=interpret,
        has_targets=has_targets,
    )
    dpos_rows = dpos.reshape(pos_rows.shape)
    dts_w2 = dts[:, :256].reshape(2, 128)
    zero_ts = jnp.zeros_like(tsq), jnp.zeros_like(tsc)
    return (
        dq, dk, dv, dpos_rows, dts_w2, zero_ts[0], zero_ts[1], None, None
    )


_relbias_call.defvjp(_relbias_vjp_fwd, _relbias_vjp_bwd)


def relbias_pallas_supported(
    H: int, N: int, D: int, V: int, itemsize: int
) -> bool:
    """True when the resident-KV fwd AND fused bwd architectures fit VMEM
    (the rel-bias kernels have no 3-D-grid fallback — research shapes
    always fit; otherwise dispatch stays on the XLA composite).

    Budgets are the rel-bias kernels' OWN (they run at
    ``_VMEM_LIMIT_BYTES`` = 100 MB scoped VMEM, not the mha kernels'
    16 MB default — round-5 review flagged that sharing the mha
    ``_use_resident`` gate here silently pushed long-N shapes onto the
    materializing-XLA path that OOMs at exactly those lengths). The fwd
    gate bounds resident K/V at 4 MB nominal (the round-3-measured
    envelope this gate always enforced); the bwd gate is calibrated on a
    measured data point: at H=8, N=640, D=V=32, f32 the row estimate
    below is 2.62 MB while Mosaic's actual scoped allocation is 22.52 MB
    (an ~8.6x hidden multiplier from pipeline double-buffering, k/v/dk/dv
    tiles, and gather temporaries). With the 100 MB limit the safe
    estimate ceiling is therefore ~8 MB."""
    Np = _round_up(N, 128)
    per_row_bwd = (D + V) * itemsize + D * itemsize + D * 4
    return (
        H * Np * (D + V) * itemsize <= 4 * 1024 * 1024
        and H * Np * per_row_bwd <= _RELBIAS_BWD_EST_LIMIT
    )
