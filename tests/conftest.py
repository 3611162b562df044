"""Test config: force an 8-virtual-device CPU platform so sharding/collective
tests run anywhere (mirrors the reference's GPU-gated single-node strategy,
SURVEY.md §4 — here we fake the mesh instead of requiring hardware)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Differential tests compare against exact numpy references; the platform's
# default matmul precision is reduced (bf16-like), so force exact f32.
jax.config.update("jax_default_matmul_precision", "highest")
