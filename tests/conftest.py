"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; the standard JAX pattern is to
fake a multi-device topology on CPU so sharding/collective code paths compile
and execute for real (SURVEY.md §4).
"""
import os

# Force-override: the shell profile exports JAX_PLATFORMS=axon (the real TPU
# chip); tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
