"""Test harness: multi-device CPU mesh for sharding tests.

Multi-chip TPU hardware isn't available in CI; sharding logic is exercised
on a virtual 8-device CPU mesh per SURVEY.md §4. Must run before JAX
initializes a backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against the double-precision reference mirror;
# library code is dtype-explicit, so f32 behavior is still exercised by
# passing float32 inputs.
jax.config.update("jax_enable_x64", True)
