"""Flash-style HSTU attention Pallas TPU kernels (fwd + bwd).

TPU twin of the reference's two kernel backends — the Triton jagged kernels
(`ops/triton/triton_hstu_attention.py:214-2170`) and the CUTLASS FA3 CUDA
kernels (`ops/cpp/hstu_attention/`, ~11.9k LoC).  HSTU attention is
softmax-free:

    S = alpha * Q K^T            P = silu(S) / max_seq_len * valid_mask
    O = P V

so no LSE bookkeeping is needed; the backward recomputes S blockwise
(dsilu fusion), mirroring the reference's recompute strategy.

Jaggedness on TPU: storage is padded-dense [B, H, N, D]; the per-row
``lengths`` are scalar-prefetched. Two kernel architectures, selected by
whether the full-row operands fit the VMEM budget:

  * resident-KV (the production shapes): grid (B, n_q) with the whole K/V
    row resident in VMEM and an in-kernel fori_loop with a DYNAMIC bound
    over live KV chunks — dead blocks cost nothing, not even a grid step,
    so wall-clock (not just DMA) is O(sum_i N_i^2). The backward fuses dq
    into the dk/dv kernel with one S/sigmoid recompute per tile pair and a
    full-row dq VMEM accumulator.
  * 3-D grid (large N): grid (B, n_q, n_kv) with ``pl.when`` compute
    skipping and index-map clamping so dead KV blocks repeat the previous
    block index and their HBM->VMEM DMA is elided.

All H heads are processed inside one grid step (head loop unrolled
in-kernel): per-step fixed cost and the [bq, bk] mask/iota construction are
amortized across heads — on v5e this is worth ~3-4x over an H-in-grid
layout at HSTU's small head dims.

Mask semantics replicate `_get_valid_attn_mask`
(`ops/pytorch/pt_hstu_attention.py:32-84`): causal, num_targets clamping,
max_attn_len local window, min_full_attn_seq_len, contextual rows — plus the
dense-layout row/col < length masking that jagged storage gets for free.

The backward pass currently requires ``bias is None`` (the production path;
research rel-bias training uses the XLA spec).  Forward supports an additive
[B, N, N] bias for parity/inference experiments.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.devices()[0].platform != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _block_mask(
    row0: jax.Array,  # scalar int32: first row index of this q block
    col0: jax.Array,  # scalar int32: first col index of this kv block
    bq: int,
    bk: int,
    length: jax.Array,  # scalar int32
    num_targets: jax.Array,  # scalar int32 (0 if unused)
    causal: bool,
    max_attn_len: int,
    contextual_seq_len: int,
    min_full_attn_seq_len: int,
    has_targets: bool = True,
) -> jax.Array:
    """bool[bq, bk] — `_get_valid_attn_mask` semantics on a tile, AND'ed with
    the dense-layout row/col < length guard.

    ``has_targets=False`` (caller passed no num_targets and no contextual
    block) takes a cheaper equivalent path: the target/contextual clamps
    only change entries at rows/cols >= length, and those are killed by the
    final guards anyway — so the clamped dist reduces to the raw iota diff.
    """
    raw_rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    raw_cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if not has_targets and contextual_seq_len == 0:
        if causal:
            valid = raw_rows >= raw_cols
        else:
            valid = jnp.ones((bq, bk), jnp.bool_)
        if max_attn_len > 0:
            dist = raw_rows - raw_cols
            if not causal:
                dist = jnp.abs(dist)
            window = dist <= max_attn_len
            if min_full_attn_seq_len > 0:
                window = jnp.logical_or(
                    window, raw_rows >= length - min_full_attn_seq_len
                )
            valid = jnp.logical_and(valid, window)
        valid = jnp.logical_and(valid, raw_cols < length)
        valid = jnp.logical_and(valid, raw_rows < length)
        return valid
    rows, cols = raw_rows, raw_cols
    max_ids = length
    if contextual_seq_len > 0:
        rows = jnp.maximum(rows - contextual_seq_len + 1, 0)
        cols = jnp.maximum(cols - contextual_seq_len + 1, 0)
        max_ids = max_ids - contextual_seq_len + 1
    max_ids = max_ids - num_targets
    rows = jnp.minimum(rows, max_ids)
    cols = jnp.minimum(cols, max_ids)
    dist = rows - cols
    if not causal:
        dist = jnp.abs(dist)
    valid = jnp.logical_or(dist > 0, raw_rows == raw_cols)
    if max_attn_len > 0:
        window = dist <= max_attn_len
        if min_full_attn_seq_len > 0:
            window = jnp.logical_or(window, rows >= max_ids - min_full_attn_seq_len)
        valid = jnp.logical_and(valid, window)
    if contextual_seq_len > 0:
        valid = jnp.logical_or(
            valid, jnp.logical_and(rows == 0, cols < max_ids)
        )
    valid = jnp.logical_and(valid, raw_cols < length)
    valid = jnp.logical_and(valid, raw_rows < length)
    return valid


def _sigmoid(x: jax.Array, variant: str = "") -> jax.Array:
    """Default: the tanh form 0.5*(tanh(x/2)+1) — mathematically identical
    to the logistic but Mosaic lowers ``tanh`` as one VPU transcendental vs
    the logistic's exp+reciprocal chain (measured on v5e fwd+bwd at the
    bench shape: 36.6 vs 29.9 TF/s). ``variant="logistic"`` restores
    jax.nn.sigmoid for A/B measurement."""
    if variant == "logistic":
        return jax.nn.sigmoid(x)
    return 0.5 * (jnp.tanh(0.5 * x) + 1.0)


def _silu(x: jax.Array, variant: str = "") -> jax.Array:
    return x * _sigmoid(x, variant)


def _dsilu(x: jax.Array, variant: str = "") -> jax.Array:
    s = _sigmoid(x, variant)
    return s * (1.0 + x * (1.0 - s))


# ============================================= forward (resident-KV) =======
#
# Grid (B, n_q) with the whole K/V row resident in VMEM (index constant per
# b, so the pipeline DMAs K/V once per row) and an in-kernel fori_loop with
# a DYNAMIC bound over KV chunks: dead chunks — beyond the row's length or
# above the causal diagonal — cost nothing at all, not even a grid step.
# This is what makes compute O(sum_i N_i^2) in wall-clock, not just in DMA:
# the 3-D-grid variant below still sequences (b, iq, j) steps for dead
# blocks (~1 us fixed cost each), which dominates at realistic jagged
# length distributions. Used whenever K+V fit the VMEM budget.


def _fwd_kernel_rkv(
    lengths_ref,  # int32[B] (scalar prefetch)
    num_targets_ref,  # int32[B]
    q_ref,  # [1, H, BQ, D]
    k_ref,  # [1, H, N, D]  (full row resident)
    v_ref,  # [1, H, N, V]
    *rest,
    bq: int,
    bk: int,
    alpha: float,
    inv_norm: float,
    causal: bool,
    max_attn_len: int,
    contextual_seq_len: int,
    min_full_attn_seq_len: int,
    has_bias: bool,
    has_targets: bool = True,
    ablate: tuple = (),
):
    if has_bias:
        bias_ref, o_ref, acc_ref = rest
    else:
        (o_ref, acc_ref) = rest
        bias_ref = None
    b, iq = pl.program_id(0), pl.program_id(1)
    H = q_ref.shape[1]
    length = lengths_ref[b]
    num_targets = num_targets_ref[b]
    row0 = iq * bq

    acc_ref[...] = jnp.zeros_like(acc_ref)

    kv_limit = length
    if causal and contextual_seq_len == 0:
        kv_limit = jnp.minimum(kv_limit, row0 + bq)

    # Two-tier KV walk ("bsplit"): tier 1 walks the WIDE chunks whose every
    # column is provably live for every live row (col < min(row0+1, length)
    # => col <= row0 <= row and col < length) with no mask and no selects;
    # tier 2 walks the remaining diagonal columns in 128-wide masked
    # sub-chunks. Because the tier bounds come from scalars — not the grid —
    # bk need not divide N on this path.
    #
    # Measured (benchmarks/tpu_r5_results/ablate_fwd_b.log): at the bench
    # shape, where bk divides N, the saved diagonal dead-area is fully
    # eaten by per-sub-chunk costs (the [bq, V] accumulator RMW and mask
    # are paid per 128-chunk): 32.9 vs 35.6 TF/s — so the wide-chunk walk
    # stays the default there. bsplit's win is the non-dividing-N shapes
    # (serving N=1280, ml-3b N=512+pad), where the legacy path would have
    # to shrink blocks to gcd(N, bk); there it is the default. Tokens:
    # "bsplit" forces it on, "nobsplit" off.
    N_res = k_ref.shape[2]
    bsplit = (
        "nobsplit" not in ablate
        and "pack2" not in ablate
        and "nomask" not in ablate
        and causal
        and not has_targets
        and max_attn_len == 0
        and contextual_seq_len == 0
        and not has_bias
        and bk % 128 == 0
        and bk > 128
        and (N_res % bk != 0 or "bsplit" in ablate)
    )

    @pl.when(row0 < length)
    def _compute():
        # alpha rides the [bq, D] q tile (hoisted out of the KV loop — the
        # scale is paid once per grid step, not once per live chunk) and
        # inv_norm the [bq, V] accumulator flush: no full-S [bq, bk] VPU
        # scaling passes and no host-side HBM round-trips (measured: a host
        # q/do prescale costs ~5% end-to-end)
        qs = [
            q_ref[0, h] if alpha == 1.0 else q_ref[0, h] * alpha
            for h in range(H)
        ]

        def make_tile(w):
            def tile(col0, mask, bias):
                if "pack2" in ablate and H % 2 == 0 and bias is None:
                    # r4 verdict next #1: block-diagonal 2-head packing —
                    # S_pack[bq, 2w] = [q_h1|q_h2] @ blockdiag(k_h1^T, k_h2^T)
                    # fills the 128-lane contraction depth at D=64. Measure-
                    # only: pass-count analysis says the zero blocks cost
                    # exactly what the padding did (output cols double), and
                    # the chip agrees (34.7 vs 35.6 TF/s fwd) — kept as the
                    # recorded falsification of that hypothesis.
                    for hp in range(H // 2):
                        h1, h2 = 2 * hp, 2 * hp + 1
                        kb1 = k_ref[0, h1, pl.ds(col0, w)]
                        kb2 = k_ref[0, h2, pl.ds(col0, w)]
                        zero = jnp.zeros_like(kb1)
                        k_bd = jnp.concatenate(
                            [
                                jnp.concatenate([kb1, zero], axis=1),
                                jnp.concatenate([zero, kb2], axis=1),
                            ],
                            axis=0,
                        )  # [2w, 2D]
                        q_cat = jnp.concatenate([qs[h1], qs[h2]], axis=1)
                        s = jax.lax.dot_general(
                            q_cat, k_bd,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [bq, 2w] = [S_h1 | S_h2]
                        act = (
                            s if "nosig" in ablate
                            else _silu(s, "logistic" if "logistic" in ablate else "")
                        )
                        if mask is None or "nowhere" in ablate:
                            p = act
                        else:
                            p = jnp.where(
                                jnp.concatenate([mask, mask], axis=1), act, 0.0
                            )
                        for h, sl in ((h1, slice(0, w)), (h2, slice(w, 2 * w))):
                            vb = v_ref[0, h, pl.ds(col0, w)]
                            acc_ref[h] += jax.lax.dot_general(
                                p[:, sl].astype(vb.dtype), vb,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                    return
                for h in range(H):
                    kb = k_ref[0, h, pl.ds(col0, w)]
                    vb = v_ref[0, h, pl.ds(col0, w)]
                    qb = qs[h]
                    s = jax.lax.dot_general(
                        qb, kb,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if bias is not None:
                        s = s + bias
                    if "bf16act" in ablate:
                        s = s.astype(jnp.bfloat16)
                    act = (
                        s if "nosig" in ablate
                        else _silu(s, "logistic" if "logistic" in ablate else "")
                    )
                    if mask is None or "nowhere" in ablate:
                        p = act
                    else:
                        p = jnp.where(mask, act, 0.0)
                    acc_ref[h] += jax.lax.dot_general(
                        p.astype(vb.dtype), vb,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

            return tile

        if bsplit:
            tile_wide = make_tile(bk)
            tile_bnd = make_tile(128)
            # cols < L1 are live for every live row of this q block
            L1 = jnp.minimum(row0 + 1, length)
            n_wide = L1 // bk

            def body_wide(j, carry):
                tile_wide(j * bk, None, None)
                return carry

            jax.lax.fori_loop(0, n_wide, body_wide, 0, unroll=False)

            bnd0 = n_wide * bk

            def body_bnd(c, carry):
                col0 = bnd0 + c * 128
                mask = _block_mask(
                    row0, col0, bq, 128, length, num_targets, causal,
                    max_attn_len, contextual_seq_len, min_full_attn_seq_len,
                    has_targets=has_targets,
                )
                tile_bnd(col0, mask, None)
                return carry

            jax.lax.fori_loop(
                0, pl.cdiv(kv_limit - bnd0, 128), body_bnd, 0, unroll=False
            )
        else:
            n_live = pl.cdiv(kv_limit, bk)
            tile = make_tile(bk)

            def body(j, carry):
                col0 = j * bk
                if bias_ref is not None:
                    bias = bias_ref[0, :, pl.ds(col0, bk)].astype(jnp.float32)
                else:
                    bias = None

                def built_mask():
                    return _block_mask(
                        row0, col0, bq, bk, length, num_targets, causal,
                        max_attn_len, contextual_seq_len,
                        min_full_attn_seq_len, has_targets=has_targets,
                    )

                if "nomask" in ablate:
                    tile(col0, None, bias)
                elif (
                    "nointerior" not in ablate and causal and not has_targets
                    and max_attn_len == 0 and contextual_seq_len == 0
                ):
                    # fully-live tile: every row >= every col and both below
                    # length — skip mask construction AND the selects
                    full_live = jnp.logical_and(
                        row0 >= col0 + bk - 1,
                        jnp.logical_and(
                            row0 + bq <= length, col0 + bk <= length
                        ),
                    )

                    @pl.when(full_live)
                    def _fast():
                        tile(col0, None, bias)

                    @pl.when(jnp.logical_not(full_live))
                    def _slow():
                        tile(col0, built_mask(), bias)
                else:
                    tile(col0, built_mask(), bias)
                return carry

            jax.lax.fori_loop(0, n_live, body, 0, unroll=False)

    if bsplit:
        # tier-1 chunks never mask, so dead q rows (>= length) carry
        # garbage in the accumulator — squash them once at the flush
        rv = row0 + jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[2], 1), 0
        ) < length
        o_ref[0] = jnp.where(
            rv[None], acc_ref[...] * inv_norm, 0.0
        ).astype(o_ref.dtype)
    else:
        o_ref[0] = (acc_ref[...] * inv_norm).astype(o_ref.dtype)


def _bwd_fused_kernel_rkv(
    lengths_ref, num_targets_ref,
    q_ref, k_ref, v_ref, do_ref,  # k/v tiles at j; q/do full rows resident
    dq_ref, dk_ref, dv_ref,
    dq_acc, dk_acc, dv_acc,
    *, bq, bk, n_kv, alpha, inv_norm, causal,
    max_attn_len, contextual_seq_len, min_full_attn_seq_len,
    has_targets=True, ablate=(),
):
    """One fused backward pass: grid (B, n_kv); for each kv tile j the inner
    dynamic loop walks the live q blocks, recomputing S/sigmoid ONCE and
    producing dk_j, dv_j AND the q-blocks' dq contributions (accumulated in
    a full-row VMEM scratch, flushed at the last kv step). Vs separate
    dq/dkv kernels this drops the matmul work from 7 to 5 S-sized products
    per (i, j) pair and one full HBM pass over q/k/v/do."""
    b, j = pl.program_id(0), pl.program_id(1)
    H = k_ref.shape[1]
    length = lengths_ref[b]
    num_targets = num_targets_ref[b]
    col0 = j * bk

    @pl.when(j == 0)
    def _init_dq():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    # Two-tier q-block walk (see _fwd_kernel_rkv): diagonal q blocks in
    # 128-wide masked column sub-chunks, interior blocks full-width
    # maskless, tail blocks full-width with a [bq, 1] row guard.
    # MEASURED-OFF by default (opt-in via the "bsplit" token): the backward
    # pays a [bq, D] f32 dq-accumulator RMW per head per sub-chunk, which
    # swamps the saved dead area — 28.7 vs 37.6 TF/s fwd+bwd at the bench
    # shape (benchmarks/tpu_r5_results/ablate_fwdbwd_b.log). The backward
    # grid always tiles dk/dv at a dividing bk, so unlike the forward there
    # is no non-dividing-N case where this path is forced.
    bsplit = (
        "bsplit" in ablate
        and "nobsplit" not in ablate
        and "nomask" not in ablate
        and causal
        and not has_targets
        and max_attn_len == 0
        and contextual_seq_len == 0
        and bk % 128 == 0
        and bk > 128
    )

    @pl.when(col0 < length)
    def _compute():
        if causal and contextual_seq_len == 0:
            i_first = col0 // bq
        else:
            i_first = 0
        n_q_live = pl.cdiv(length, bq)

        def tile(row0, cl, w, mask, legacy_mwhere=False):
            """One [bq, w] tile pair at local column offset ``cl`` into the
            kv chunk; mask=None skips every select."""

            def mwhere(x):
                if mask is None or (legacy_mwhere and "nowhere" in ablate):
                    return x
                return jnp.where(mask, x, 0.0)

            # alpha rides the [bq, D] q tile and inv_norm the [bq, V]
            # do tile (s unchanged; dp/ds carry inv_norm via do; dk/dv
            # land exactly; dq takes one *alpha at the flush) — no
            # full-S VPU scaling passes and no host HBM round-trips
            for h in range(H):
                qb = q_ref[0, h, pl.ds(row0, bq)]
                if alpha != 1.0:
                    qb = qb * alpha
                dob = do_ref[0, h, pl.ds(row0, bq)] * inv_norm
                kb = k_ref[0, h] if w == bk else k_ref[0, h, pl.ds(cl, w)]
                vb = v_ref[0, h] if w == bk else v_ref[0, h, pl.ds(cl, w)]
                s = jax.lax.dot_general(
                    qb, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if "bf16act" in ablate:
                    s = s.astype(jnp.bfloat16)
                if "nosig" in ablate:
                    sig = 1.0
                else:
                    sig = _sigmoid(s, "logistic" if "logistic" in ablate else "")  # shared by p and dsilu
                p = mwhere(s * sig)
                dv_upd = jax.lax.dot_general(
                    p.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    dob, vb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dsilu = sig * (1.0 + s * (1.0 - sig))
                ds = mwhere(dp * dsilu)
                ds16 = ds.astype(qb.dtype)
                dk_upd = jax.lax.dot_general(
                    ds16, qb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if w == bk:
                    dv_acc[h] += dv_upd
                    dk_acc[h] += dk_upd
                else:
                    dv_acc[h, pl.ds(cl, w)] += dv_upd
                    dk_acc[h, pl.ds(cl, w)] += dk_upd
                dq_acc[h, pl.ds(row0, bq)] += jax.lax.dot_general(
                    ds16, kb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        if bsplit:
            # first q block fully right of the diagonal (row0 >= col0+bk-1)
            i_diag_end = jnp.minimum(
                pl.cdiv(col0 + bk - 1, bq), n_q_live
            )
            # last q block whose rows are ALL < length
            i_int_end = jnp.maximum(i_diag_end, length // bq)
            i_tail0 = jnp.minimum(i_int_end, n_q_live)

            def body_diag(i, carry):
                row0 = i * bq
                # live cols of this block within the chunk
                sub_end = (
                    jnp.minimum(row0 + bq, jnp.minimum(length, col0 + bk))
                    - col0
                )

                def body_sub(c, carry2):
                    cl = c * 128
                    mask = _block_mask(
                        row0, col0 + cl, bq, 128, length, num_targets,
                        causal, max_attn_len, contextual_seq_len,
                        min_full_attn_seq_len, has_targets=has_targets,
                    )
                    tile(row0, cl, 128, mask)
                    return carry2

                jax.lax.fori_loop(
                    0, pl.cdiv(sub_end, 128), body_sub, 0, unroll=False
                )
                return carry

            jax.lax.fori_loop(i_first, i_diag_end, body_diag, 0, unroll=False)

            def body_int(i, carry):
                tile(i * bq, 0, bk, None)
                return carry

            jax.lax.fori_loop(i_diag_end, i_tail0, body_int, 0, unroll=False)

            def body_tail(i, carry):
                row0 = i * bq
                rowmask = (
                    row0
                    + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
                    < length
                )
                tile(row0, 0, bk, rowmask)
                return carry

            jax.lax.fori_loop(i_tail0, n_q_live, body_tail, 0, unroll=False)
        else:

            def body(i, carry):
                row0 = i * bq

                def built_mask():
                    return _block_mask(
                        row0, col0, bq, bk, length, num_targets, causal,
                        max_attn_len, contextual_seq_len,
                        min_full_attn_seq_len, has_targets=has_targets,
                    )

                if "nomask" in ablate:
                    tile(row0, 0, bk, None)
                elif (
                    "nointerior" not in ablate and causal and not has_targets
                    and max_attn_len == 0 and contextual_seq_len == 0
                ):
                    full_live = jnp.logical_and(
                        row0 >= col0 + bk - 1,
                        jnp.logical_and(
                            row0 + bq <= length, col0 + bk <= length
                        ),
                    )

                    @pl.when(full_live)
                    def _fast():
                        tile(row0, 0, bk, None)

                    @pl.when(jnp.logical_not(full_live))
                    def _slow():
                        tile(row0, 0, bk, built_mask(), legacy_mwhere=True)
                else:
                    tile(row0, 0, bk, built_mask(), legacy_mwhere=True)
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


# VMEM budgets for keeping full rows resident per grid step (double-buffered
# by the pipeline; leave headroom for tiles + accumulators). The backward
# additionally keeps an f32 dq accumulator for the whole row, so its
# footprint is K/V-resident + H*N*D*4 — hence the separate check.
#
# Accounting counts Mosaic LANE PADDING: a [..., D] VMEM array is stored
# with its minor dim padded to a multiple of 128 lanes, so D=32 operands
# occupy 4x their nominal bytes. Budgets are calibrated against shapes
# proven on chip: fwd N4096/H4/D64 (8 MB padded K/V) compiles and runs, so
# the fwd limit is 8 MB inclusive; the r4 H8/D32/N2048 Mosaic compile crash
# (verdict weak #5) was the BACKWARD — 21 MB of real padded residency that
# the old unpadded formula scored as 5.2 MB — so the bwd limit (11 MB,
# = the bench shape's 10.5 MB padded footprint plus headroom) now evicts it
# to the tiled 3-D-grid kernels.
# DUAL gate: the padded-bytes bound rejects shapes whose lane padding blows
# VMEM (D=32 pads 4x — the r4 H8/D32/N2048 Mosaic crash), while the
# nominal-bytes bound keeps the round-3-measured envelope for shapes with
# no padding inflation (D,V >= 128 and/or f32) — raising only the padded
# limit silently admitted f32 D=128 N=1280 to the resident backward, which
# needs 17.5 MB of scoped VMEM against the 16 MB limit
# (benchmarks/tpu_r5_results/mfalcon_e.log uih=1024/M=40 compile crash).
_RESIDENT_BYTES_LIMIT = 8 * 1024 * 1024
_RESIDENT_BYTES_LIMIT_NOMINAL = 4 * 1024 * 1024


def _lane_pad(d: int) -> int:
    return d + ((-d) % 128)


def _use_resident(H: int, N: int, D: int, V: int, itemsize: int) -> bool:
    padded = H * N * (_lane_pad(D) + _lane_pad(V)) * itemsize
    nominal = H * N * (D + V) * itemsize
    return (
        padded <= _RESIDENT_BYTES_LIMIT
        and nominal <= _RESIDENT_BYTES_LIMIT_NOMINAL
    )


# the backward's per-step residency (q + do + dq out + f32 dq accumulator)
# is ~2.6x the forward's K/V, so it gets a proportionally larger budget;
# both leave headroom for tiles + pipeline double-buffering in VMEM
_RESIDENT_BYTES_LIMIT_BWD = 11 * 1024 * 1024
_RESIDENT_BYTES_LIMIT_BWD_NOMINAL = 6 * 1024 * 1024


def _use_resident_bwd(H: int, N: int, D: int, V: int, itemsize: int) -> bool:
    # resident per step: q + do rows ((D+V)*itemsize), the dq output row
    # (D*itemsize), and the f32 dq accumulator (D*4)
    Dp, Vp = _lane_pad(D), _lane_pad(V)
    padded = H * N * ((Dp + Vp) * itemsize + Dp * itemsize + Dp * 4)
    nominal = H * N * ((D + V) * itemsize + D * itemsize + D * 4)
    return (
        padded <= _RESIDENT_BYTES_LIMIT_BWD
        and nominal <= _RESIDENT_BYTES_LIMIT_BWD_NOMINAL
    )


# =============================================================== forward ====


def _fwd_kernel(
    # scalar prefetch
    lengths_ref,  # int32[B]
    num_targets_ref,  # int32[B]
    # inputs
    q_ref,  # [1, H, BQ, D]
    k_ref,  # [1, H, BK, D]
    v_ref,  # [1, H, BK, V]
    *rest,
    bq: int,
    bk: int,
    n_kv: int,
    alpha: float,
    inv_norm: float,
    causal: bool,
    max_attn_len: int,
    contextual_seq_len: int,
    min_full_attn_seq_len: int,
    has_bias: bool,
    has_targets: bool = True,
    ablate: tuple = (),
):
    if has_bias:
        bias_ref, o_ref, acc_ref = rest
    else:
        (o_ref, acc_ref) = rest
        bias_ref = None
    b, iq, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    H = q_ref.shape[1]
    length = lengths_ref[b]
    num_targets = num_targets_ref[b]

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # is this kv block live for this q block?
    row0 = iq * bq
    col0 = j * bk
    kv_limit = length  # cols >= length are masked
    if causal and contextual_seq_len == 0:
        kv_limit = jnp.minimum(kv_limit, row0 + bq)
    live = jnp.logical_and(col0 < kv_limit, row0 < length)

    @pl.when(live)
    def _compute():
        mask = _block_mask(
            row0, col0, bq, bk, length, num_targets, causal,
            max_attn_len, contextual_seq_len, min_full_attn_seq_len,
            has_targets=has_targets,
        )
        bias = (
            bias_ref[0].astype(jnp.float32) if bias_ref is not None else None
        )
        for h in range(H):  # unrolled; amortizes mask across heads
            qb = q_ref[0, h] if alpha == 1.0 else q_ref[0, h] * alpha
            s = jax.lax.dot_general(
                qb, k_ref[0, h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if bias is not None:
                s = s + bias
            p = jnp.where(mask, _silu(s), 0.0)
            acc_ref[h] += jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == n_kv - 1)
    def _write():
        o_ref[0] = (acc_ref[...] * inv_norm).astype(o_ref.dtype)


def _clamped_kv_index(b, iq, j, lengths_ref, *, bq, bk, causal, contextual):
    """KV block index with dead blocks clamped to the last live one so their
    DMA is elided (same block index => pipeline skips the copy)."""
    length = lengths_ref[b]
    limit = length
    if causal and contextual == 0:
        limit = jnp.minimum(limit, (iq + 1) * bq)
    last_live = jnp.maximum(pl.cdiv(limit, bk) - 1, 0)
    return jnp.minimum(j, last_live)


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha", "max_seq_len", "causal", "max_attn_len", "contextual_seq_len",
        "min_full_attn_seq_len", "block_q", "block_k", "interpret",
        "has_targets", "ablate",
    ),
)
def _hstu_mha_fwd(
    q: jax.Array,  # [B, H, N, D]
    k: jax.Array,
    v: jax.Array,  # [B, H, N, V]
    lengths: jax.Array,  # int32[B]
    num_targets: jax.Array,  # int32[B]
    bias: Optional[jax.Array],  # [B, N, N] or None
    *,
    alpha: float,
    max_seq_len: int,
    causal: bool,
    max_attn_len: int,
    contextual_seq_len: int,
    min_full_attn_seq_len: int,
    block_q: int,
    block_k: int,
    interpret: bool,
    has_targets: bool = True,
    ablate: tuple = (),
) -> jax.Array:
    B, H, N, D = q.shape
    V = v.shape[-1]
    bq, bk = min(block_q, N), min(block_k, N)
    n_q, n_kv = _cdiv(N, bq), _cdiv(N, bk)
    if _use_resident(H, N, D, V, q.dtype.itemsize):
        in_specs = [
            pl.BlockSpec((1, H, bq, D), lambda b, iq, L, T: (b, 0, iq, 0)),
            pl.BlockSpec((1, H, N, D), lambda b, iq, L, T: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, N, V), lambda b, iq, L, T: (b, 0, 0, 0)),
        ]
        inputs = [q, k, v]
        if bias is not None:
            in_specs.append(
                pl.BlockSpec((1, bq, N), lambda b, iq, L, T: (b, iq, 0))
            )
            inputs.append(bias)
        kernel = functools.partial(
            _fwd_kernel_rkv,
            bq=bq, bk=bk, alpha=alpha, inv_norm=1.0 / max_seq_len,
            causal=causal, max_attn_len=max_attn_len,
            contextual_seq_len=contextual_seq_len,
            min_full_attn_seq_len=min_full_attn_seq_len,
            has_bias=bias is not None,
            has_targets=has_targets, ablate=ablate,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, n_q),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (1, H, bq, V), lambda b, iq, L, T: (b, 0, iq, 0)
                ),
                scratch_shapes=[pltpu.VMEM((H, bq, V), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, N, V), v.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(lengths.astype(jnp.int32), num_targets.astype(jnp.int32), *inputs)
    kv_idx = functools.partial(
        _clamped_kv_index, bq=bq, bk=bk, causal=causal,
        contextual=contextual_seq_len,
    )
    in_specs = [
        pl.BlockSpec((1, H, bq, D), lambda b, iq, j, L, T: (b, 0, iq, 0)),
        pl.BlockSpec(
            (1, H, bk, D),
            lambda b, iq, j, L, T: (b, 0, kv_idx(b, iq, j, L), 0),
        ),
        pl.BlockSpec(
            (1, H, bk, V),
            lambda b, iq, j, L, T: (b, 0, kv_idx(b, iq, j, L), 0),
        ),
    ]
    inputs = [q, k, v]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, bq, bk),
                lambda b, iq, j, L, T: (b, iq, kv_idx(b, iq, j, L)),
            )
        )
        inputs.append(bias)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_q, n_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, H, bq, V), lambda b, iq, j, L, T: (b, 0, iq, 0)
        ),
        scratch_shapes=[pltpu.VMEM((H, bq, V), jnp.float32)],
    )
    kernel = functools.partial(
        _fwd_kernel,
        bq=bq, bk=bk, n_kv=n_kv, alpha=alpha, inv_norm=1.0 / max_seq_len,
        causal=causal, max_attn_len=max_attn_len,
        contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
        has_bias=bias is not None,
        has_targets=has_targets, ablate=ablate,
    )
    flops = 2 * B * H * N * N * (D + V)  # upper bound (pre-skip)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, V), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q.size * 4 + k.size * 4 + v.size * 8,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), num_targets.astype(jnp.int32), *inputs)


# ============================================================== backward ====


def _bwd_dq_kernel(
    lengths_ref, num_targets_ref,
    q_ref, k_ref, v_ref, do_ref,  # q/do: [1,H,BQ,*] resident; k/v: [1,H,BK,*]
    dq_ref, acc_ref,
    *, bq, bk, n_kv, alpha, inv_norm, causal,
    max_attn_len, contextual_seq_len, min_full_attn_seq_len,
    has_targets=True, ablate=(),
):
    b, iq, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    H = q_ref.shape[1]
    length = lengths_ref[b]
    num_targets = num_targets_ref[b]

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    row0, col0 = iq * bq, j * bk
    kv_limit = length
    if causal and contextual_seq_len == 0:
        kv_limit = jnp.minimum(kv_limit, row0 + bq)
    live = jnp.logical_and(col0 < kv_limit, row0 < length)

    @pl.when(live)
    def _compute():
        mask = _block_mask(
            row0, col0, bq, bk, length, num_targets, causal,
            max_attn_len, contextual_seq_len, min_full_attn_seq_len,
            has_targets=has_targets,
        )
        for h in range(H):
            # alpha rides the [bq, D] q tile, inv_norm the [bq, V] do tile,
            # and the final *alpha lands at the dq flush
            qb = q_ref[0, h] if alpha == 1.0 else q_ref[0, h] * alpha
            s = jax.lax.dot_general(
                qb, k_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do_ref[0, h] * inv_norm, v_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = jnp.where(mask, dp * _dsilu(s), 0.0)
            acc_ref[h] += jax.lax.dot_general(
                ds.astype(k_ref.dtype), k_ref[0, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == n_kv - 1)
    def _write():
        acc = acc_ref[...]
        if alpha != 1.0:
            acc = acc * alpha
        dq_ref[0] = acc.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    lengths_ref, num_targets_ref,
    q_ref, k_ref, v_ref, do_ref,  # k/v: [1,H,BK,*] resident; q/do: [1,H,BQ,*]
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, bq, bk, n_q, alpha, inv_norm, causal,
    max_attn_len, contextual_seq_len, min_full_attn_seq_len,
    has_targets=True, ablate=(),
):
    b, j, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    H = q_ref.shape[1]
    length = lengths_ref[b]
    num_targets = num_targets_ref[b]

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    row0, col0 = i * bq, j * bk
    # q block i is live for kv block j if any row >= col (causal) / any row valid
    live = jnp.logical_and(row0 < length, col0 < length)
    if causal and contextual_seq_len == 0:
        live = jnp.logical_and(live, row0 + bq > col0)

    @pl.when(live)
    def _compute():
        mask = _block_mask(
            row0, col0, bq, bk, length, num_targets, causal,
            max_attn_len, contextual_seq_len, min_full_attn_seq_len,
            has_targets=has_targets,
        )
        for h in range(H):
            # alpha rides the [bq, D] q tile, inv_norm the [bq, V] do tile
            qb = q_ref[0, h] if alpha == 1.0 else q_ref[0, h] * alpha
            dob = do_ref[0, h] * inv_norm
            s = jax.lax.dot_general(
                qb, k_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK]
            sig = _sigmoid(s)  # shared between p and dsilu
            p = jnp.where(mask, s * sig, 0.0)
            # dV_j += P^T dO  (dO carries inv_norm)
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
            # dK_j += dS^T (alpha Q) = alpha * dS^T Q exactly
            dk_acc[h] += jax.lax.dot_general(
                ds.astype(qb.dtype), qb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(i == n_q - 1)
    def _write():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha", "max_seq_len", "causal", "max_attn_len", "contextual_seq_len",
        "min_full_attn_seq_len", "block_q", "block_k", "interpret",
        "has_targets", "ablate",
    ),
)
def _hstu_mha_bwd(
    q, k, v, lengths, num_targets, do,
    *, alpha, max_seq_len, causal, max_attn_len, contextual_seq_len,
    min_full_attn_seq_len, block_q, block_k, interpret,
    has_targets=True, ablate=(),
):
    B, H, N, D = q.shape
    V = v.shape[-1]
    bq, bk = min(block_q, N), min(block_k, N)
    # the backward grids tile dk/dv outputs at bk, so bk must divide N here
    # even when the forward ran the two-tier path with a free bk
    while N % bk:
        bk //= 2
    n_q, n_kv = _cdiv(N, bq), _cdiv(N, bk)
    common = dict(
        alpha=alpha, inv_norm=1.0 / max_seq_len, causal=causal,
        max_attn_len=max_attn_len, contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
        has_targets=has_targets, ablate=ablate,
    )
    if _use_resident_bwd(H, N, D, V, q.dtype.itemsize):
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_fused_kernel_rkv, bq=bq, bk=bk, n_kv=n_kv, **common
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, n_kv),
                in_specs=[
                    pl.BlockSpec((1, H, N, D), lambda b, j, L, T: (b, 0, 0, 0)),
                    pl.BlockSpec((1, H, bk, D), lambda b, j, L, T: (b, 0, j, 0)),
                    pl.BlockSpec((1, H, bk, V), lambda b, j, L, T: (b, 0, j, 0)),
                    pl.BlockSpec((1, H, N, V), lambda b, j, L, T: (b, 0, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, H, N, D), lambda b, j, L, T: (b, 0, 0, 0)),
                    pl.BlockSpec((1, H, bk, D), lambda b, j, L, T: (b, 0, j, 0)),
                    pl.BlockSpec((1, H, bk, V), lambda b, j, L, T: (b, 0, j, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((H, N, D), jnp.float32),
                    pltpu.VMEM((H, bk, D), jnp.float32),
                    pltpu.VMEM((H, bk, V), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
                jax.ShapeDtypeStruct((B, H, N, V), v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(lengths.astype(jnp.int32), num_targets.astype(jnp.int32), q, k, v, do)
        return dq, dk, dv
    kv_idx = functools.partial(
        _clamped_kv_index, bq=bq, bk=bk, causal=causal,
        contextual=contextual_seq_len,
    )

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, bq=bq, bk=bk, n_kv=n_kv, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, H, bq, D), lambda b, iq, j, L, T: (b, 0, iq, 0)),
                pl.BlockSpec(
                    (1, H, bk, D),
                    lambda b, iq, j, L, T: (b, 0, kv_idx(b, iq, j, L), 0),
                ),
                pl.BlockSpec(
                    (1, H, bk, V),
                    lambda b, iq, j, L, T: (b, 0, kv_idx(b, iq, j, L), 0),
                ),
                pl.BlockSpec((1, H, bq, V), lambda b, iq, j, L, T: (b, 0, iq, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, H, bq, D), lambda b, iq, j, L, T: (b, 0, iq, 0)
            ),
            scratch_shapes=[pltpu.VMEM((H, bq, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), num_targets.astype(jnp.int32), q, k, v, do)

    def q_idx(b, j, i, L, T):
        # clamp q-block index to live range for this kv block (causal skip)
        length = L[b]
        first_live = (j * bk) // bq if (causal and contextual_seq_len == 0) else 0
        last_live = jnp.maximum(pl.cdiv(length, bq) - 1, 0)
        return jnp.clip(i, first_live, last_live)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, bq=bq, bk=bk, n_q=n_q, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_kv, n_q),
            in_specs=[
                pl.BlockSpec(
                    (1, H, bq, D), lambda b, j, i, L, T: (b, 0, q_idx(b, j, i, L, T), 0)
                ),
                pl.BlockSpec((1, H, bk, D), lambda b, j, i, L, T: (b, 0, j, 0)),
                pl.BlockSpec((1, H, bk, V), lambda b, j, i, L, T: (b, 0, j, 0)),
                pl.BlockSpec(
                    (1, H, bq, V), lambda b, j, i, L, T: (b, 0, q_idx(b, j, i, L, T), 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, H, bk, D), lambda b, j, i, L, T: (b, 0, j, 0)),
                pl.BlockSpec((1, H, bk, V), lambda b, j, i, L, T: (b, 0, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((H, bk, D), jnp.float32),
                pltpu.VMEM((H, bk, V), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, N, V), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), num_targets.astype(jnp.int32), q, k, v, do)
    return dq, dk, dv


# ============================================================ public API ====


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
)
def _hstu_mha_pallas_core(
    q, k, v, lengths, num_targets,
    alpha, max_seq_len, causal, max_attn_len, contextual_seq_len,
    min_full_attn_seq_len, block_q, block_k, interpret,
    has_targets, ablate,
):
    return _hstu_mha_fwd(
        q, k, v, lengths, num_targets, None,
        alpha=alpha, max_seq_len=max_seq_len, causal=causal,
        max_attn_len=max_attn_len, contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
        block_q=block_q, block_k=block_k, interpret=interpret,
        has_targets=has_targets, ablate=ablate,
    )


def _pack_rows(xt):
    """[B, H, N, D] -> [B, N, H*D] for residual storage: the kernel layout
    puts a D-wide minor dim that XLA lane-pads to 128 (2x held-HBM waste at
    D=64, 4x at D=32, across EVERY layer's saved q/k/v in a deep model);
    folding H*D into the minor dim stores residuals unpadded, and the
    backward's re-transpose is a per-layer transient."""
    B, H, N, D = xt.shape
    return jnp.transpose(xt, (0, 2, 1, 3)).reshape(B, N, H * D)


def _unpack_rows(xp, H):
    B, N, HD = xp.shape
    return jnp.transpose(xp.reshape(B, N, H, HD // H), (0, 2, 1, 3))


def _core_fwd(q, k, v, lengths, num_targets, *static):
    out = _hstu_mha_pallas_core(q, k, v, lengths, num_targets, *static)
    return out, (
        _pack_rows(q), _pack_rows(k), _pack_rows(v), lengths, num_targets
    )


def _core_bwd(
    alpha, max_seq_len, causal, max_attn_len, contextual_seq_len,
    min_full_attn_seq_len, block_q, block_k, interpret,
    has_targets, ablate, residuals, do,
):
    qp, kp, vp, lengths, num_targets = residuals
    H = do.shape[1]  # do is the [B, H, N, V] cotangent of out
    q, k, v = _unpack_rows(qp, H), _unpack_rows(kp, H), _unpack_rows(vp, H)
    dq, dk, dv = _hstu_mha_bwd(
        q, k, v, lengths, num_targets, do,
        alpha=alpha, max_seq_len=max_seq_len, causal=causal,
        max_attn_len=max_attn_len, contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
        block_q=block_q, block_k=block_k, interpret=interpret,
        has_targets=has_targets, ablate=ablate,
    )
    return dq, dk, dv, None, None


_hstu_mha_pallas_core.defvjp(_core_fwd, _core_bwd)


def hstu_mha_dense_pallas(
    q: jax.Array,  # [B, N, H, D]
    k: jax.Array,
    v: jax.Array,  # [B, N, H, V]
    lengths: jax.Array,  # int[B]
    *,
    alpha: float = 1.0,
    max_seq_len: Optional[int] = None,
    bias: Optional[jax.Array] = None,  # [B, N, N] (forward-only path)
    causal: bool = True,
    num_targets: Optional[jax.Array] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    min_full_attn_seq_len: int = 0,
    block_q: int = 0,  # 0 = auto (factory table / measured per-shape cache)
    block_k: int = 0,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in Pallas twin of :func:`...xla.hstu_attention.hstu_mha_dense`
    (with jagged semantics via ``lengths``: rows/cols >= lengths[b] are dead
    and outputs there are zero). Returns [B, N, H, V]."""
    B, N, H, D = q.shape
    V = v.shape[-1]
    if max_seq_len is None:
        max_seq_len = N
    if block_q == 0 or block_k == 0:
        from generative_recommenders_tpu.ops.pallas import autotune

        abq, abk = autotune.get_blocks("mha", B, N, H, D, V, q.dtype)
        block_q, block_k = block_q or abq, block_k or abk
    if interpret is None:
        interpret = _interpret_default()
    nt = (
        jnp.zeros((B,), jnp.int32)
        if num_targets is None
        else num_targets.astype(jnp.int32)
    )
    # measurement-only hook (benchmarks/kernel_ablate.py): comma-separated
    # {nosig, nomask, nowhere} time with pieces removed (results WRONG);
    # {logistic, nointerior, nobsplit, pack2} revert/replace the
    # measured-default exact lowerings
    # NOTE: the 'logistic' A/B token only affects the resident-row kernels
    # (_fwd_kernel_rkv/_bwd_fused_kernel_rkv); the 3-D-grid fallback backward
    # kernels always use the production tanh lowering via _sigmoid/_dsilu
    # defaults — A/B measurements are only meaningful on resident shapes.
    ablate = tuple(
        sorted(
            t
            for t in os.environ.get("GR_TPU_KERNEL_ABLATE", "").split(",")
            if t
        )
    )
    # Pad N to a tile-aligned length: unaligned blocks (e.g. the research
    # stack's N=211) force Mosaic into slow unaligned layouts. Extra rows
    # are beyond every row's length, so the masks keep them dead. N >= 256
    # pads to a 256-multiple so the measured-best block_q always divides.
    N_orig = N
    N_pad = (-N) % (256 if N >= 256 else (128 if N >= 128 else 8))
    if N_pad:
        pad4 = ((0, 0), (0, N_pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad4), jnp.pad(k, pad4), jnp.pad(v, pad4)
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, N_pad), (0, N_pad)))
        N = N + N_pad
    # block_q must DIVIDE the padded N (it tiles the grid); halve until it
    # fits. block_k need not when the forward takes the two-tier resident
    # path (its chunk bounds come from scalars) — which covers every
    # plain-causal resident shape — but every other path slices with
    # in-kernel pl.ds where a partial last block would clamp the
    # dynamic-slice start and silently attend the wrong rows.
    while N % block_q:
        block_q //= 2
    bsplit_ok = (
        "nobsplit" not in ablate
        and "pack2" not in ablate
        and "nomask" not in ablate
        and causal
        and num_targets is None
        and max_attn_len == 0
        and contextual_seq_len == 0
        and bias is None
        and block_k % 128 == 0
        and block_k > 128
        and _use_resident(H, N, D, V, q.dtype.itemsize)
    )
    if not bsplit_ok:
        while N % block_k:
            block_k //= 2
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    # no num_targets and no contextual block => the kernels build the cheap
    # raw-iota mask (see _block_mask has_targets=False)
    has_targets = num_targets is not None
    if bias is not None:
        out = _hstu_mha_fwd(
            qt, kt, vt, lengths.astype(jnp.int32), nt, bias,
            alpha=alpha, max_seq_len=max_seq_len, causal=causal,
            max_attn_len=max_attn_len, contextual_seq_len=contextual_seq_len,
            min_full_attn_seq_len=min_full_attn_seq_len,
            block_q=block_q, block_k=block_k, interpret=interpret,
            has_targets=has_targets, ablate=ablate,
        )
    else:
        out = _hstu_mha_pallas_core(
            qt, kt, vt, lengths.astype(jnp.int32), nt,
            alpha, max_seq_len, causal, max_attn_len, contextual_seq_len,
            min_full_attn_seq_len, block_q, block_k, interpret,
            has_targets, ablate,
        )
    out = jnp.transpose(out, (0, 2, 1, 3))
    if N_pad:
        out = out[:, :N_orig]
    return out


# ==================================================== delta-q (M-FALCON) ====
#
# Cached-decode kernel: the M newest queries of each row attend over the
# full (cache + delta) K/V. TPU twin of the reference's dedicated cached
# kernels — Triton `triton_cached_hstu_mha` / `_attn_fwd` with IS_DELTA_Q
# (`ops/triton/triton_hstu_attention.py:2096-2170`) and the CUDA delta path
# (`ops/cpp/hstu_attention/flash_api.cpp`) — consumed by
# `modules/stu.py:cached_forward` (M-FALCON incremental scoring).
#
# Architecture: grid (B,) with K/V rows resident (the serving shapes fit —
# uih+cands <= ~4k) and an in-kernel dynamic-bound loop over live KV chunks,
# so each request only pays for its OWN cache length — the XLA fallback's
# [B, H, M, N] einsum always pays the padded N.


def _delta_block_mask(
    row_raw: jax.Array,  # int32 [Mp, 1] — absolute query positions
    col0: jax.Array,  # scalar int32
    bk: int,
    length: jax.Array,  # scalar int32 (full cache+delta length)
    num_targets: jax.Array,  # scalar int32 (0 if unused)
    m_valid: jax.Array,  # bool [Mp, 1] — padding-row guard
    causal: bool,
    max_attn_len: int,
    contextual_seq_len: int,
    min_full_attn_seq_len: int,
    has_targets: bool = True,
) -> jax.Array:
    """bool [Mp, bk] — `make_delta_attn_mask` semantics on a column tile
    (`ops/attention_mask.py:93-135`).

    ``has_targets=False`` + causal + no contextual block: delta rows all sit
    below ``length``, so causal alone keeps every column < length — the mask
    reduces to one compare (plus the window/padding guards)."""
    Mp = row_raw.shape[0]
    cols_raw = col0 + jax.lax.broadcasted_iota(jnp.int32, (Mp, bk), 1)
    if has_targets is False and contextual_seq_len == 0 and causal:
        valid = row_raw >= cols_raw
        if max_attn_len > 0:
            window = row_raw - cols_raw <= max_attn_len
            if min_full_attn_seq_len > 0:
                window = jnp.logical_or(
                    window, row_raw >= length - min_full_attn_seq_len
                )
            valid = jnp.logical_and(valid, window)
        return jnp.logical_and(valid, m_valid)
    rows, cols = row_raw, cols_raw
    max_ids = length
    if contextual_seq_len > 0:
        rows = jnp.maximum(rows - contextual_seq_len + 1, 0)
        cols = jnp.maximum(cols - contextual_seq_len + 1, 0)
        max_ids = max_ids - contextual_seq_len + 1
    max_ids = max_ids - num_targets
    rows = jnp.minimum(rows, max_ids)
    cols = jnp.minimum(cols, max_ids)
    dist = rows - cols
    if not causal:
        dist = jnp.abs(dist)
    valid = jnp.logical_or(dist > 0, row_raw == cols_raw)
    if max_attn_len > 0:
        window = dist <= max_attn_len
        if min_full_attn_seq_len > 0:
            window = jnp.logical_or(
                window, rows >= max_ids - min_full_attn_seq_len
            )
        valid = jnp.logical_and(valid, window)
    if contextual_seq_len > 0:
        valid = jnp.logical_or(
            valid, jnp.logical_and(rows == 0, cols < max_ids)
        )
    return jnp.logical_and(valid, m_valid)


def _delta_fwd_kernel_rkv(
    lengths_ref,  # int32[B] — FULL lengths (cache + delta)
    num_targets_ref,  # int32[B]
    q_ref,  # [1, H, Mp, D]
    k_ref,  # [1, H, N, D]  (full row resident)
    v_ref,  # [1, H, N, V]
    o_ref,  # [1, H, Mp, V]
    acc_ref,  # scratch [H, Mp, V] f32
    *,
    M: int,  # true delta size (Mp >= M is the padded tile)
    bk: int,
    alpha: float,
    inv_norm: float,
    causal: bool,
    max_attn_len: int,
    contextual_seq_len: int,
    min_full_attn_seq_len: int,
    has_targets: bool = True,
):
    b = pl.program_id(0)
    H, Mp = q_ref.shape[1], q_ref.shape[2]
    N = k_ref.shape[2]
    length = lengths_ref[b]
    num_targets = num_targets_ref[b]

    acc_ref[...] = jnp.zeros_like(acc_ref)

    m_iota = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    row_raw = jnp.clip(length - M + m_iota, 0, N - 1)
    m_valid = m_iota < M

    # every live column is < length (delta rows end at length-1; all mask
    # escapes stay below length) — dead chunks cost nothing
    n_live = pl.cdiv(length, bk)

    def body(j, carry):
        col0 = j * bk
        mask = _delta_block_mask(
            row_raw, col0, bk, length, num_targets, m_valid, causal,
            max_attn_len, contextual_seq_len, min_full_attn_seq_len,
            has_targets=has_targets,
        )
        for h in range(H):
            kb = k_ref[0, h, pl.ds(col0, bk)]
            vb = v_ref[0, h, pl.ds(col0, bk)]
            qb = q_ref[0, h] if alpha == 1.0 else q_ref[0, h] * alpha
            s = jax.lax.dot_general(
                qb, kb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.where(mask, _silu(s), 0.0)
            acc_ref[h] += jax.lax.dot_general(
                p.astype(vb.dtype), vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return carry

    jax.lax.fori_loop(0, n_live, body, 0, unroll=False)
    o_ref[0] = (acc_ref[...] * inv_norm).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha", "norm_len", "delta_size", "causal", "max_attn_len",
        "contextual_seq_len", "min_full_attn_seq_len", "block_k", "interpret",
        "has_targets",
    ),
)
def _delta_fwd(
    q, k, v, lengths, num_targets,
    *, alpha, norm_len, delta_size, causal, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, block_k, interpret,
    has_targets=True,
):
    B, H, Mp, D = q.shape
    N, V = k.shape[2], v.shape[-1]
    bk = min(block_k, N)
    while N % bk:
        bk //= 2
    kernel = functools.partial(
        _delta_fwd_kernel_rkv,
        M=delta_size, bk=bk, alpha=alpha, inv_norm=1.0 / norm_len,
        causal=causal, max_attn_len=max_attn_len,
        contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len,
        has_targets=has_targets,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, Mp, D), lambda b, L, T: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, N, D), lambda b, L, T: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, N, V), lambda b, L, T: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, H, Mp, V), lambda b, L, T: (b, 0, 0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((H, Mp, V), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Mp, V), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), num_targets.astype(jnp.int32), q, k, v)


def delta_hstu_mha_pallas(
    delta_q: jax.Array,  # [B, M, H, D]
    k: jax.Array,  # [B, N, H, D] — full (cache + delta) keys, padded
    v: jax.Array,  # [B, N, H, V]
    seq_lengths: jax.Array,  # int[B] — full valid length per row
    *,
    alpha: float = 1.0,
    num_targets: Optional[jax.Array] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    min_full_attn_seq_len: int = 0,
    norm_len: Optional[int] = None,
    block_k: int = 0,  # 0 = auto (factory table / measured per-shape cache)
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Pallas twin of `ops/hstu_compute.py:delta_hstu_mha` (forward-only —
    the M-FALCON serving path). Returns [B, M, H, V]."""
    B, M, H, D = delta_q.shape
    N, V = k.shape[1], v.shape[-1]
    if block_k == 0:
        from generative_recommenders_tpu.ops.pallas import autotune

        block_k = autotune.get_blocks("delta", B, N, H, D, V, k.dtype)[1]
    if norm_len is None:
        norm_len = N
    if interpret is None:
        interpret = _interpret_default()
    nt = (
        jnp.zeros((B,), jnp.int32)
        if num_targets is None
        else num_targets.astype(jnp.int32)
    )
    # pad to the same buckets as the mha kernel (autotune._bucket_n) so the
    # FACTORY winners measured at the padded shape actually apply
    N_orig = N
    N_pad = (-N) % (256 if N >= 256 else (128 if N >= 128 else 8))
    if N_pad:
        pad4 = ((0, 0), (0, N_pad), (0, 0), (0, 0))
        k, v = jnp.pad(k, pad4), jnp.pad(v, pad4)
        N += N_pad
    Mp = _cdiv(M, 8) * 8
    if Mp != M:
        delta_q = jnp.pad(delta_q, ((0, 0), (0, Mp - M), (0, 0), (0, 0)))
    qt = jnp.transpose(delta_q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = _delta_fwd(
        qt, kt, vt, seq_lengths.astype(jnp.int32), nt,
        alpha=alpha, norm_len=norm_len, delta_size=M, causal=True,
        max_attn_len=max_attn_len, contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len, block_k=block_k,
        interpret=interpret, has_targets=num_targets is not None,
    )
    out = jnp.transpose(out, (0, 2, 1, 3))
    return out[:, :M]


def delta_pallas_supported(H: int, N: int, D: int, V: int, itemsize: int) -> bool:
    """True when the resident-KV delta kernel fits VMEM (estimated at the
    kernel's ACTUAL padded length — 256-multiples from N >= 256, matching
    delta_hstu_mha_pallas's padding)."""
    Np = N + ((-N) % (256 if N >= 256 else 128))
    return _use_resident(H, Np, D, V, itemsize)
