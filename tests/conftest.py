"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; the standard JAX pattern is to
fake a multi-device topology on CPU so sharding/collective code paths compile
and execute for real (SURVEY.md §4).

NOTE: this machine's sitecustomize registers the `axon` TPU plugin and
overrides the JAX_PLATFORMS env var via jax.config — so the env var alone is
NOT enough; we must call jax.config.update after importing jax.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
