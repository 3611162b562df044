"""MXU-width ablation: is the D=64 kernel floor structural or attackable?

VERDICT r3 weak #7 / next #6: the flash-HSTU kernel's matmul-only floor
(~41 TF/s at the bench shape H4/D64/V64) sits at ~42% of the MXU ceiling,
and the hypothesis was that the 64-wide contraction (QK^T) / 64-wide output
lanes (PV, dKV) run the 128x128 systolic array half-empty. A block-diagonal
"pack two heads" trick does NOT reduce tile-pass count (the packed weight
tile is full-width but half zeros — same passes as two half-width tiles),
so the honest question is empirical: does the SAME kernel at the SAME total
FLOPs but 128-wide D/V run ~2x faster?

This sweeps (H, D, V) at a constant per-batch FLOP budget H*(D+V) = 512
(plus narrower/wider controls), each timed fwd+bwd with the two-length
differential. TF/s uses each shape's own jagged FLOPs model, so a jump at
D=V=128 isolates the lane-width effect.

Usage: python benchmarks/mxu_width_sweep.py [N] [B]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_LO, N_HI = 50, 250


def _dep(x):
    return jnp.where(
        x.reshape(-1)[0].astype(jnp.int32) == jnp.int32(-123456789), 1, 0
    )


def _diff_time(make_loop, n_lo=N_LO, n_hi=N_HI, reps=3) -> float:
    f_lo, f_hi = make_loop(n_lo), make_loop(n_hi)
    int(f_lo())
    int(f_hi())
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(f_lo())
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(f_hi())
        t_hi = time.perf_counter() - t0
        diffs.append((t_hi - t_lo) / (n_hi - n_lo))
    diffs.sort()
    med = diffs[len(diffs) // 2]
    if med <= 0:
        raise RuntimeError("non-positive differential")
    return med


def main():
    from generative_recommenders_tpu.ops.pallas.hstu_attention import (
        hstu_mha_dense_pallas,
    )

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    lengths = jnp.asarray(
        np.clip(rng.integers(N // 8, N, size=(B,)), 1, N), jnp.int32
    )
    lens = np.asarray(lengths, np.float64)

    # (H, D, V): bench baseline; same-FLOPs full-width; mixed; controls
    shapes = [
        (4, 64, 64),    # bench baseline (H*(D+V) = 512)
        (2, 128, 128),  # same FLOPs, 128-wide contraction AND output lanes
        (2, 64, 192),   # same FLOPs, wide-V only (PV/dKV full-width)
        (2, 192, 64),   # same FLOPs, wide-D only (QK^T full-depth)
        (8, 32, 32),    # same FLOPs, narrower (expect slower)
        (4, 128, 128),  # 2x FLOPs, full-width (throughput ceiling probe)
    ]
    for H, D, V in shapes:
        q = jnp.asarray(
            rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype
        )
        k = jnp.asarray(
            rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype
        )
        v = jnp.asarray(
            rng.standard_normal((B, N, H, V), np.float32) * 0.1, dtype
        )
        alpha = 1.0 / D**0.5
        fwd_flops = float((2.0 * H * (D + V) * lens**2 / 2.0).sum())
        total_flops = fwd_flops * 3.5

        def loss(q, k, v, lens_):
            o = hstu_mha_dense_pallas(
                q, k, v, lengths=lens_, alpha=alpha, max_seq_len=N,
                causal=True,
            )
            return jnp.sum((o * o).astype(jnp.float32))

        fn = jax.grad(loss, argnums=(0, 1, 2))

        def make_loop(n):
            @jax.jit
            def f(q, k, v):
                def body(i, c):
                    # carry feeds a real operand so the body can't be hoisted
                    r = fn(q, k, v, lengths + c)
                    return _dep(r[0]) + _dep(r[1])

                return jax.lax.fori_loop(0, n, body, jnp.int32(0))

            return functools.partial(f, q, k, v)

        try:
            t = _diff_time(make_loop)
            print(
                f"H{H} D{D:3d} V{V:3d}: {t*1e6:8.1f} us  "
                f"{total_flops/t/1e12:6.2f} TF/s",
                flush=True,
            )
        except Exception as e:
            print(f"H{H} D{D:3d} V{V:3d}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
