"""Headline benchmark: flash-HSTU Pallas attention (fwd+bwd) on real TPU.

TPU twin of the reference's kernel benchmark
(`ops/benchmarks/hstu_attention_bench.py:35-59`): jagged HSTU attention,
FLOPs model = sum_i 2*H*(dqk+dv)*N_i^2 / 2 (causal) for the forward, x3.5
for fwd+bwd. ``vs_baseline`` = speedup over the fused XLA attention on the
same chip (the reference's "pytorch eager vs triton" axis; no absolute
reference numbers are published — BASELINE.md).

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from generative_recommenders_tpu.ops.pallas.hstu_attention import (
        hstu_mha_dense_pallas,
    )
    from generative_recommenders_tpu.ops.xla.hstu_attention import (
        hstu_mha_dense,
    )

    B, N, H, D = 32, 1024, 4, 64
    rng = np.random.default_rng(0)
    # sparse jagged lengths like the reference's generate_sparse_seq_len
    lengths = jnp.asarray(
        np.clip(rng.integers(N // 8, N, size=(B,)), 1, N), jnp.int32
    )
    q = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1)
    k = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1)
    v = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1)
    alpha = 1.0 / D**0.5

    mask_rows = jnp.arange(N)[:, None] >= jnp.arange(N)[None, :]
    valid = jnp.arange(N)[None, :] < lengths[:, None]
    xla_mask = (
        mask_rows[None] & valid[:, :, None] & valid[:, None, :]
    )  # causal + jagged

    def pallas_fwdbwd(q, k, v):
        def loss(q, k, v):
            o = hstu_mha_dense_pallas(
                q, k, v, lengths=lengths, alpha=alpha, max_seq_len=N,
                causal=True,
            )
            return jnp.sum(o * o)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def xla_fwdbwd(q, k, v):
        def loss(q, k, v):
            o = hstu_mha_dense(
                q, k, v, alpha=alpha, max_seq_len=N, mask=xla_mask
            )
            return jnp.sum(o * o)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    pallas_t = _bench(jax.jit(pallas_fwdbwd), (q, k, v))
    xla_t = _bench(jax.jit(xla_fwdbwd), (q, k, v))

    lens = np.asarray(lengths, np.float64)
    fwd_flops = float((2.0 * H * (D + D) * lens**2 / 2.0).sum())
    total_flops = 3.5 * fwd_flops  # fwd + bwd(2.5x)
    tflops = total_flops / pallas_t / 1e12

    print(
        json.dumps(
            {
                "metric": "flash_hstu_attention_fwdbwd_tflops",
                "value": round(tflops, 3),
                "unit": f"TFLOP/s (B{B}xN{N}xH{H}xD{D} jagged, causal)",
                "vs_baseline": round(xla_t / pallas_t, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
