"""Kernel VPU-budget ablation at the bench shape.

Times the flash-HSTU kernel with pieces surgically removed (via the
measurement-only `GR_TPU_KERNEL_ABLATE` hook — results are numerically
wrong under ablation, only the timing is meaningful) to attribute the gap
between the full kernel and its matmul-only floor:

  base            full kernel
  nosig           sigmoid replaced by identity (transcendental cost)
  nomask          no mask construction and no select (mask+where cost)
  nowhere         mask built but selects skipped (where-only cost)
  nosig,nomask    matmul-only floor

Usage: python benchmarks/kernel_ablate.py [N] [fwd|fwdbwd] [bq] [bk]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_LO, N_HI = 50, 250  # fwdbwd; fwd-only uses a longer loop (see below)


def _dep(x):
    return jnp.where(
        x.reshape(-1)[0].astype(jnp.int32) == jnp.int32(-123456789), 1, 0
    )


def _diff_time(make_loop, n_lo=N_LO, n_hi=N_HI, reps=3) -> float:
    """Two-length differential loop timing.

    Round-3 postmortem: at fwd-only granularity (~100 us/iter) a 200-iter
    differential is ~20 ms of device time — the same order as host/relay
    jitter — and the min-of-diffs estimator went NEGATIVE. Fix: callers
    scale the loop counts so the differential is >=100 ms of device time,
    we take the MEDIAN of per-rep diffs (negative-robust), and reject the
    measurement loudly rather than report a negative rate.
    """
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
        raise RuntimeError(
            f"non-positive differential ({med*1e6:.1f} us) — loop counts "
            f"too small for this granularity; raise n_lo/n_hi"
        )
    return med


def main():
    from generative_recommenders_tpu.ops.pallas.hstu_attention import (
        hstu_mha_dense_pallas,
    )

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    mode = sys.argv[2] if len(sys.argv) > 2 else "fwdbwd"
    bq = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    bk = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    B, H, D = 8, 4, 64
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    lengths = jnp.asarray(
        np.clip(rng.integers(N // 8, N, size=(B,)), 1, N), jnp.int32
    )
    q = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype)
    k = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype)
    v = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype)
    alpha = 1.0 / D**0.5

    lens = np.asarray(lengths, np.float64)
    fwd_flops = float((2.0 * H * (D + D) * lens**2 / 2.0).sum())
    total_flops = fwd_flops * (3.5 if mode == "fwdbwd" else 1.0)

    # "" = production (tanh sigmoid + interior fast path); logistic /
    # nointerior revert the two measured-default lowerings for A/B
    for ablate in ["", "bsplit", "logistic", "nointerior", "nosig", "nomask", "nowhere", "nosig,nomask", "bf16act", "pack2"]:
        os.environ["GR_TPU_KERNEL_ABLATE"] = ablate

        def loss(q, k, v, lens):
            o = hstu_mha_dense_pallas(
                q, k, v, lengths=lens, alpha=alpha, max_seq_len=N,
                causal=True, block_q=bq, block_k=bk,
            )
            return jnp.sum((o * o).astype(jnp.float32))

        fn = jax.grad(loss, argnums=(0, 1, 2)) if mode == "fwdbwd" else loss

        def make_loop(n):
            @jax.jit
            def f(q, k, v):
                def body(i, c):
                    # carry feeds a real operand (bench.py pattern): c is 0
                    # at runtime but XLA cannot prove it, so the body is not
                    # loop-invariant and cannot be hoisted (r4 verdict weak#3)
                    r = fn(q, k, v, lengths + c)
                    if mode == "fwdbwd":
                        return _dep(r[0]) + _dep(r[1])
                    return _dep(r)

                return jax.lax.fori_loop(0, n, body, jnp.int32(0))

            return functools.partial(f, q, k, v)

        try:
            if mode == "fwd":
                # fwd iterations are ~3.5x cheaper: scale the differential
                # so it stays well above host/relay jitter (round-3 fix)
                t = _diff_time(make_loop, n_lo=100, n_hi=1100, reps=5)
            else:
                t = _diff_time(make_loop)
            print(
                f"{ablate or 'base':14s}: {t*1e6:8.1f} us  "
                f"{total_flops/t/1e12:6.2f} TF/s",
                flush=True,
            )
        except Exception as e:
            print(f"{ablate or 'base':14s}: FAIL {str(e)[:140]}", flush=True)
    os.environ.pop("GR_TPU_KERNEL_ABLATE", None)


if __name__ == "__main__":
    main()
