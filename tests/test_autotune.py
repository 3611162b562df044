"""Block autotuner: lookup precedence, persistence, and legality.

Twin of the reference's per-shape Triton autotune cache
(`ops/triton/triton_hstu_attention.py:42-213`): best blocks are resolved
per (N, H, D, dtype) bucket from a committed factory table plus a
per-machine measured cache; off-TPU the sweep never runs and the static
heuristic applies.
"""

import json
import os

import jax.numpy as jnp
import pytest

from generative_recommenders_tpu.ops.pallas import autotune


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "GR_TPU_ATTN_BLOCKS", str(tmp_path / "attn_blocks.json")
    )
    autotune._runtime = None
    autotune._failed = set()
    yield
    autotune._runtime = None
    autotune._failed = set()


def test_factory_hit():
    assert autotune.get_blocks("mha", 8, 2048, 4, 64, 64, jnp.bfloat16) == (
        256, 512,
    )


def test_heuristic_fallback_off_tpu():
    # unseen bucket, CPU backend: static heuristic, no sweep, no cache write
    bq, bk = autotune.get_blocks("mha", 8, 768, 2, 32, 32, jnp.float32)
    assert (bq, bk) == (256, 256)
    assert not os.path.exists(os.environ["GR_TPU_ATTN_BLOCKS"])


def test_runtime_cache_beats_factory_and_persists(tmp_path):
    path = os.environ["GR_TPU_ATTN_BLOCKS"]
    key = autotune._key("mha", 2048, 4, 64, 64, jnp.bfloat16)
    with open(path, "w") as f:
        json.dump({key: [512, 512]}, f)
    autotune._runtime = None
    assert autotune.get_blocks("mha", 8, 2048, 4, 64, 64, jnp.bfloat16) == (
        512, 512,
    )


def test_bucketing_pads_to_128():
    # the research stack's N=211 pads to 256 — same bucket as N=256
    assert autotune._bucket_n(211) == 256
    assert autotune._key("mha", 211, 4, 64, 64, jnp.float32) == autotune._key(
        "mha", 256, 4, 64, 64, jnp.float32
    )


def test_kind_specific_heuristics():
    assert autotune.heuristic_blocks("delta", 4096)[1] == 256
    assert autotune.heuristic_blocks("relbias", 4096) == (256, 256)
    assert autotune.heuristic_blocks("mha", 4096) == (256, 512)
