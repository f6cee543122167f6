"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on CPU via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4); the real TPU
chip is exercised by bench.py, not the unit suite.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
# (must happen before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
