"""Headline benchmark: flash-HSTU Pallas attention (fwd+bwd) on real TPU.

TPU twin of the reference's kernel benchmark
(`ops/benchmarks/hstu_attention_bench.py:35-59`): jagged HSTU attention,
FLOPs model = sum_i 2*H*(dqk+dv)*N_i^2 / 2 (causal) for the forward, x3.5
for fwd+bwd. ``vs_baseline`` = speedup over the fused XLA attention on the
same chip (the reference's "eager vs triton" axis; no absolute reference
numbers are published — BASELINE.md).

Timing methodology (this chip sits behind a relay with multi-ms dispatch
noise): run the op inside an on-device ``fori_loop`` with an unfoldable
scalar carry, and time the *difference* between a 250-iteration and a
50-iteration loop, so both per-dispatch overhead and loop fixed costs cancel.

Prints exactly one JSON line.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_LO, N_HI = 50, 250


def _dep(x):
    """Unfoldable all-zero scalar derived from x (defeats DCE/LICM)."""
    return jnp.where(
        x.reshape(-1)[0].astype(jnp.int32) == jnp.int32(-123456789), 1, 0
    )


def _diff_time(make_loop) -> float:
    f_lo, f_hi = make_loop(N_LO), make_loop(N_HI)
    int(f_lo())
    int(f_hi())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(f_lo())
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(f_hi())
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (N_HI - N_LO))
    return best


def main() -> None:
    from generative_recommenders_tpu.ops.pallas.hstu_attention import (
        hstu_mha_dense_pallas,
    )
    from generative_recommenders_tpu.ops.xla.hstu_attention import (
        hstu_mha_dense,
    )

    B, N, H, D = 8, 2048, 4, 64
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    lengths = jnp.asarray(
        np.clip(rng.integers(N // 8, N, size=(B,)), 1, N), jnp.int32
    )
    q = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype)
    k = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype)
    v = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype)
    alpha = 1.0 / D**0.5

    mask_rows = jnp.arange(N)[:, None] >= jnp.arange(N)[None, :]

    def pallas_loss(q, k, v, lens):
        o = hstu_mha_dense_pallas(
            q, k, v, lengths=lens, alpha=alpha, max_seq_len=N, causal=True
        )
        return jnp.sum((o * o).astype(jnp.float32))

    def xla_loss(q, k, v, lens):
        valid = jnp.arange(N)[None, :] < lens[:, None]
        mask = mask_rows[None] & valid[:, :, None] & valid[:, None, :]
        o = hstu_mha_dense(q, k, v, alpha=alpha, max_seq_len=N, mask=mask)
        return jnp.sum((o * o).astype(jnp.float32))

    def make_loop_factory(loss):
        grad = jax.grad(loss, argnums=(0, 1, 2))

        def make_loop(n):
            @jax.jit
            def f(q, k, v):
                def body(i, c):
                    dq, dk, dv = grad(q, k, v, lengths + c)
                    return _dep(dq) + _dep(dk)

                return jax.lax.fori_loop(0, n, body, jnp.int32(0))

            return functools.partial(f, q, k, v)

        return make_loop

    pallas_t = _diff_time(make_loop_factory(pallas_loss))
    xla_t = _diff_time(make_loop_factory(xla_loss))

    lens = np.asarray(lengths, np.float64)
    fwd_flops = float((2.0 * H * (D + D) * lens**2 / 2.0).sum())
    total_flops = 3.5 * fwd_flops  # fwd + bwd(2.5x)
    tflops = total_flops / pallas_t / 1e12

    print(
        json.dumps(
            {
                "metric": "flash_hstu_attention_fwdbwd_tflops",
                "value": round(tflops, 3),
                "unit": f"TFLOP/s (B{B}xN{N}xH{H}xD{D} jagged causal bf16)",
                "vs_baseline": round(xla_t / pallas_t, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
