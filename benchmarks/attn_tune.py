"""Block-size tuning sweep for the Pallas HSTU attention kernels.

Produces the committed FACTORY table in `ops/pallas/autotune.py` (r4 verdict
next #7: the reference autotunes ~40 configs per shape bucket,
`triton_hstu_attention.py:1247-1456`; our legal space is small because
blocks must divide the padded N, but every production shape must have a
measured winner, not a heuristic).

Shape registry = every shape the repo actually dispatches:
  * bench shape family      mha  H4/D64/V64   N512/1024/2048
  * ML-20M HSTU-large       mha  H8/D32/V32   N256 (seq 200 + targets)
  * ml-3b preset            mha  H8/D32/V32   N640 (seq 500 + targets)
  * serving (configs/dlrm)  mha  H4/D128/V128 N640/1152 (uih 512/1024 + cands)
  * rel-bias training       rb   H8/D32/V32   N640/1152
  * M-FALCON delta decode   dlt  H4/D128/V128 N640/1152

Timing: fwd+bwd differential loop (bench.py pattern — carry feeds lengths).
Prints one line per (shape, candidate) and a FACTORY-formatted dict at the
end. Usage: python benchmarks/attn_tune.py [ignored...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _dep(x):
    return jnp.where(
        x.reshape(-1)[0].astype(jnp.int32) == jnp.int32(-123456789), 1, 0
    )


def _diff_time(make_loop, lo=10, hi=50, reps=3) -> float:
    f_lo, f_hi = make_loop(lo), make_loop(hi)
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
        diffs.append((t_hi - t_lo) / (hi - lo))
    diffs.sort()
    med = diffs[len(diffs) // 2]
    if med <= 0:
        raise RuntimeError("non-positive differential")
    return med


def main():
    from generative_recommenders_tpu.ops.pallas import hstu_attention as ha
    from generative_recommenders_tpu.ops.pallas import (
        hstu_attention_relbias as rb,
    )
    from generative_recommenders_tpu.ops.pallas.autotune import (
        _CANDIDATES, _DELTA_CANDIDATES, _bucket_n, _divides, _key,
    )

    # (kind, N, H, D, V[, dtype]) — every shape a default config dispatches
    REGISTRY = [
        ("mha", 2048, 4, 64, 64),
        ("mha", 1024, 4, 64, 64),
        ("mha", 512, 4, 64, 64),
        ("mha", 256, 8, 32, 32),     # ML-20M HSTU-large research
        ("mha", 640, 8, 32, 32),     # ml-3b preset (seq 500 + targets)
        ("mha", 640, 4, 128, 128),   # serving uih 512
        ("mha", 1152, 4, 128, 128),  # serving uih 1024
        # ml-3b preset's ACTUAL rel-bias shape: runtime N=511 -> bucket
        # N512, in the preset's default f32 AND the bf16 production dtype
        ("relbias", 511, 8, 32, 32, jnp.float32),
        ("relbias", 511, 8, 32, 32),
        ("relbias", 640, 8, 32, 32),
        ("relbias", 1152, 8, 32, 32),
        ("delta", 640, 4, 128, 128),
        ("delta", 1152, 4, 128, 128),
    ]
    B = 8
    rng = np.random.default_rng(0)
    factory = {}

    for entry in REGISTRY:
        kind, N, H, D, V = entry[:5]
        dtype = entry[5] if len(entry) > 5 else jnp.bfloat16
        Np = _bucket_n(N, kind)
        lengths = jnp.asarray(
            np.clip(rng.integers(max(1, N // 8), N + 1, size=(B,)), 1, N),
            jnp.int32,
        )
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
        lens = np.asarray(lengths, np.float64)
        fwd_flops = float((2.0 * H * (D + V) * lens**2 / 2.0).sum())

        if kind == "delta":
            cands = [(0, bk) for bk in _DELTA_CANDIDATES if _divides(bk, Np)]
        elif kind == "mha":
            # the two-tier forward frees bk from the divide-N rule (the
            # bwd halves bk internally when needed); only bq tiles the grid
            cands = [
                (bq, bk)
                for bq, bk in _CANDIDATES
                if _divides(bq, Np) and bk % 128 == 0
            ]
        else:
            cands = [
                (bq, bk)
                for bq, bk in _CANDIDATES
                if _divides(bq, Np) and _divides(bk, Np)
            ]

        best_t, best_cfg = float("inf"), None
        for bq, bk in cands:
            if kind == "delta":
                M = min(128, max(8, N // 8))
                total_flops = float(
                    (2.0 * H * (D + V) * M * lens).sum()
                )

                def fn(q, k, v, lens_):
                    return ha.delta_hstu_mha_pallas(
                        q[:, -M:], k, v, lens_, alpha=alpha, block_k=bk
                    )

            elif kind == "relbias":
                total_flops = fwd_flops * 3.5
                ts = jnp.cumsum(
                    jnp.asarray(rng.integers(1, 1000, (B, N)), jnp.int32),
                    axis=1,
                )
                pos_w = jnp.asarray(
                    rng.standard_normal((2 * N - 1,), np.float32) * 0.02
                )
                ts_w = jnp.asarray(
                    rng.standard_normal((129,), np.float32) * 0.02
                )

                def loss(q_, k_, v_, lens_):
                    o = rb.hstu_mha_dense_pallas_relbias(
                        q_, k_, v_, lens_, ts, pos_w, ts_w, alpha=alpha,
                        max_seq_len=N, causal=True, block_q=bq, block_k=bk,
                    )
                    return jnp.sum((o * o).astype(jnp.float32))

                fn = jax.grad(loss, argnums=(0, 1, 2))
            else:
                total_flops = fwd_flops * 3.5

                def loss(q_, k_, v_, lens_):
                    o = ha.hstu_mha_dense_pallas(
                        q_, k_, v_, lengths=lens_, alpha=alpha,
                        max_seq_len=N, causal=True, block_q=bq, block_k=bk,
                    )
                    return jnp.sum((o * o).astype(jnp.float32))

                fn = jax.grad(loss, argnums=(0, 1, 2))

            def make_loop(n):
                @jax.jit
                def f(q, k, v):
                    def body(i, c):
                        r = fn(q, k, v, lengths + c)
                        if isinstance(r, tuple):
                            return _dep(r[0]) + _dep(r[1])
                        return _dep(r)

                    return jax.lax.fori_loop(0, n, body, jnp.int32(0))

                return functools.partial(f, q, k, v)

            try:
                # delta iterations are ~30x cheaper than a fwd+bwd step:
                # scale the differential so it stays above relay jitter
                # (attn_tune_c's sub-10us delta rows were noise)
                if kind == "delta":
                    t = _diff_time(make_loop, lo=100, hi=900, reps=3)
                else:
                    t = _diff_time(make_loop)
                print(
                    f"{kind:7s} N{N:4d} H{H} D{D:3d} V{V:3d} "
                    f"bq={bq:4d} bk={bk:4d}: {t*1e6:8.1f} us  "
                    f"{total_flops/t/1e12:6.2f} TF/s",
                    flush=True,
                )
                if t < best_t:
                    best_t, best_cfg = t, (bq, bk)
            except Exception as e:
                print(
                    f"{kind:7s} N{N:4d} H{H} D{D:3d} V{V:3d} "
                    f"bq={bq:4d} bk={bk:4d}: FAIL {str(e)[:110]}",
                    flush=True,
                )
        if best_cfg is not None:
            factory[_key(kind, N, H, D, V, dtype)] = best_cfg

    print("\nFACTORY = {")
    for key in sorted(factory):
        print(f'    "{key}": {factory[key]},')
    print("}")


if __name__ == "__main__":
    main()
