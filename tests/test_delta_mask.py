"""make_delta_attn_mask must equal the corresponding rows of the full mask
(the [B, M, N] direct computation replaces the [B, N, N] materialize+slice)."""

import jax.numpy as jnp
import numpy as np
import pytest

from generative_recommenders_tpu.ops.attention_mask import (
    make_delta_attn_mask,
    make_valid_attn_mask,
)


@pytest.mark.parametrize(
    "max_attn_len,contextual,min_full",
    [(0, 0, 0), (8, 0, 0), (0, 3, 0), (8, 0, 4), (6, 2, 3)],
)
def test_delta_mask_equals_full_rows(max_attn_len, contextual, min_full):
    N, B, M = 32, 3, 4
    lengths = jnp.asarray([10, 32, 7], jnp.int32)
    nt = jnp.asarray([4, 2, 3], jnp.int32)
    full = make_valid_attn_mask(
        N, lengths, causal=True, num_targets=nt,
        max_attn_len=max_attn_len, contextual_seq_len=contextual,
        min_full_attn_seq_len=min_full,
    )
    row_idx = jnp.clip(
        lengths[:, None] - M + jnp.arange(M)[None, :], 0, N - 1
    ).astype(jnp.int32)
    want = jnp.take_along_axis(full, row_idx[:, :, None], axis=1)
    got = make_delta_attn_mask(
        N, lengths, row_idx, causal=True, num_targets=nt,
        max_attn_len=max_attn_len, contextual_seq_len=contextual,
        min_full_attn_seq_len=min_full,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
