"""The has_targets=False mask fast paths are exactly the full mask.

The kernels build a cheap raw-iota mask when the caller passes no
num_targets and no contextual block (`ops/pallas/hstu_attention.py:
_block_mask`, `_delta_block_mask`); these tests sweep tile positions,
lengths, and window configs and assert bit-equality with the full
(clamped) construction at num_targets == 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_recommenders_tpu.ops.pallas.hstu_attention import (
    _block_mask,
    _delta_block_mask,
)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize(
    "max_attn_len,min_full", [(0, 0), (7, 0), (7, 5)]
)
def test_block_mask_fast_path_equals_full(causal, max_attn_len, min_full):
    bq = bk = 16
    nt = jnp.int32(0)
    for length in [1, 5, 16, 23, 32, 48]:
        for row0 in [0, 16, 32]:
            for col0 in [0, 16, 32]:
                args = (
                    jnp.int32(row0), jnp.int32(col0), bq, bk,
                    jnp.int32(length), nt, causal, max_attn_len, 0, min_full,
                )
                full = _block_mask(*args, has_targets=True)
                fast = _block_mask(*args, has_targets=False)
                np.testing.assert_array_equal(
                    np.asarray(full), np.asarray(fast),
                    err_msg=f"L={length} r0={row0} c0={col0} "
                    f"causal={causal} w={max_attn_len}/{min_full}",
                )


@pytest.mark.parametrize(
    "max_attn_len,min_full", [(0, 0), (9, 0), (9, 4)]
)
def test_delta_mask_fast_path_equals_full(max_attn_len, min_full):
    bk, M, N = 16, 6, 64
    nt = jnp.int32(0)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    for length in [6, 17, 40, 64]:
        row_raw = jnp.clip(length - M + m_iota, 0, N - 1)
        m_valid = m_iota < M
        for col0 in [0, 16, 32, 48]:
            args = (
                row_raw, jnp.int32(col0), bk, jnp.int32(length), nt,
                m_valid, True, max_attn_len, 0, min_full,
            )
            full = _delta_block_mask(*args, has_targets=True)
            fast = _delta_block_mask(*args, has_targets=False)
            np.testing.assert_array_equal(
                np.asarray(full), np.asarray(fast),
                err_msg=f"L={length} c0={col0} w={max_attn_len}/{min_full}",
            )
