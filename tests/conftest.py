"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run on any host (SURVEY.md §4 multi-node note).

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (TPU tunnel), so we must override the already-imported
config, not just the env var.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
