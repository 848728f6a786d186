"""Device-mesh helpers for multi-chip scaling.

The reference is single-process CPU with a std::thread pool
(SURVEY.md §2 parallelism table); the TPU-native scaling story is:

  * data parallelism over (images x perturbations) — batch axis sharded over
    the mesh, XLA inserts the psum over ICI for the normal-equations
    reduction (parallel/dist.py);
  * the F x F solve is replicated (F = 8801 for RCR-22: a 310 MB AtA, cheap
    to replicate, pointless to shard at this scale — SURVEY.md §2);
  * batched detection shards over faces.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the first `num_devices` devices (default all).

    Raises if fewer than `num_devices` devices exist — a silently
    truncated mesh would make any multi-chip validation vacuous.
    """
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"make_mesh({num_devices}) but only {len(devices)} "
                f"device(s) are visible ({devices[0].platform}); for a "
                f"virtual CPU mesh set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{num_devices} JAX_PLATFORMS=cpu before jax initialises")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(array, mesh: Mesh, axis_name: str = "data"):
    """Place an array sharded along its leading (batch) axis."""
    spec = P(axis_name, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def replicate(array, mesh: Mesh):
    """Place an array fully replicated over the mesh."""
    return jax.device_put(array, NamedSharding(mesh, P()))
