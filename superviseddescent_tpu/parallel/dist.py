"""Distributed training and inference over a device mesh.

The one true communication pattern this framework needs (SURVEY.md §5):
the regularised least-squares learn is

    AtA = sum_shards A_s^T A_s      Atb = sum_shards A_s^T b_s

— a psum over the batch-sharded axis (ICI within a slice), followed by a
replicated F x F factorisation. Implemented with shard_map so the collective
placement is explicit; inference sharding just annotates the face batch and
lets XLA partition the whole cascade.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superviseddescent_tpu.core.regulariser import Regulariser
from superviseddescent_tpu.ops.solver import _solve_from_normal


def distributed_train_level(features, b, regulariser: Regulariser,
                            mesh: Mesh, axis_name: str = "data",
                            method: str = "lu",
                            num_samples: int = None):
    """One cascade level's learn, sharded over the sample axis.

    features: (N, F) batch-sharded design matrix (observed values).
    b: (N, P) batch-sharded targets (normalised update steps).
    num_samples: sample count for the MatrixNorm lambda rule; defaults to
    N — pass the unpadded count when zero-padded rows were added to make
    the batch divide the mesh.

    Each shard computes its partial normal equations on the MXU; a psum over
    the mesh forms the full AtA / Atb; every device runs the (replicated)
    factorisation. Returns the (F, P) weights, replicated.
    """
    n_total = num_samples if num_samples is not None else features.shape[0]

    def level_fn(f_shard, b_shard):
        ata_part = jnp.dot(f_shard.T, f_shard,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=f_shard.dtype)
        atb_part = jnp.dot(f_shard.T, b_shard,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=f_shard.dtype)
        ata = jax.lax.psum(ata_part, axis_name)
        atb = jax.lax.psum(atb_part, axis_name)
        return _solve_from_normal(ata, atb, n_total, regulariser, method)

    shard = jax.shard_map(
        level_fn, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None)),
        out_specs=P(None, None))
    return shard(features, b)


def sharded_detect(model, images, faceboxes, mesh: Mesh,
                   axis_name: str = "data", quantize: bool = True):
    """Batched RCR detection sharded over faces.

    images: (B, H, W) per-face image stack; faceboxes: (B, 4). Both are
    placed batch-sharded; the full 4-level cascade runs as one partitioned
    XLA program (weights replicated, faces split over the mesh).
    """
    batch = images.shape[0]
    spec3 = NamedSharding(mesh, P(axis_name, None, None))
    spec2 = NamedSharding(mesh, P(axis_name, None))
    images = jax.device_put(jnp.asarray(images, jnp.float32), spec3)
    faceboxes = jax.device_put(jnp.asarray(faceboxes, jnp.float32), spec2)

    @functools.partial(jax.jit, out_shardings=spec2)
    def run(imgs, boxes):
        return model.detect_batch(
            imgs, boxes,
            image_indices=jnp.arange(batch, dtype=jnp.int32),
            quantize=quantize)

    return run(images, faceboxes)


def make_sharded_fused_detector(model, mesh: Mesh, roi: int,
                                axis_name: str = "data", max_ied=None):
    """Build the fused whole-cascade kernel (ops/cascade_pallas.py) as a
    data-parallel shard_map callable: each device runs the kernel on its
    face shard — zero cross-device communication (the cascade is
    embarrassingly parallel over faces), so throughput scales linearly
    with the mesh. Pallas kernels are opaque to GSPMD, hence the explicit
    shard_map rather than sharding annotations.

    Returns ``f(images (B, H, W) batch-sharded, faceboxes (B, 4)) ->
    (B, 2L)``; B must divide the mesh size. The callable is jitted and
    reusable — the benchmark path measures it directly
    (bench.py: "sharded fused" line).
    """
    detect = model.make_fused_detector(roi=roi, max_ied=max_ied)
    run = jax.shard_map(
        detect, mesh=mesh,
        in_specs=(P(axis_name, None, None), P(axis_name, None)),
        out_specs=P(axis_name, None),
        # pallas_call does not annotate varying-across-mesh metadata
        check_vma=False)
    return jax.jit(run)


class ShardedHogTransform:
    """Data-parallel wrapper for a HogTransform whose extraction runs
    GSPMD-opaque Pallas kernels (the window / fused patch backends):
    an explicit shard_map runs each device's face shard through the
    kernel while the image stack (and frame table) ride in as replicated
    closure constants — so ``train_rcr(mesh=...)`` composes with the
    memory-scalable 300-W extraction configs instead of silently
    falling back to replication (VERDICT r3 item 5).

    The wrapped object keeps the batched-projection contract
    ``h(x (N, 2L), level) -> (N, F)``; N must divide the mesh (train_rcr
    already pads the sample axis to a device multiple). Per-shard
    chunking (HogTransform.chunk_size) still applies inside each shard.
    """

    def __init__(self, hog, mesh: Mesh, axis_name: str = "data"):
        self.hog = hog
        self.mesh = mesh
        self.axis_name = axis_name
        self._fns = {}

    def feature_dim(self, level: int = 0) -> int:
        return self.hog.feature_dim(level)

    def __call__(self, x, level: int):
        n = x.shape[0]
        n_dev = self.mesh.devices.size
        if n % n_dev:
            raise ValueError(
                f"sample count {n} must divide the mesh ({n_dev})")
        key = (level, n)
        if key not in self._fns:
            def body(x_shard, idx_shard):
                return self.hog.call_with_indices(x_shard, level,
                                                  idx_shard)

            self._fns[key] = jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(self.axis_name, None), P(self.axis_name)),
                out_specs=P(self.axis_name, None),
                # pallas_call does not annotate varying-across-mesh
                # metadata (same caveat as make_sharded_fused_detector)
                check_vma=False))
        return self._fns[key](x, self.hog._indices_for(n))


def sharded_detect_fused(model, images, faceboxes, mesh: Mesh,
                         roi: int, axis_name: str = "data",
                         max_ied=None):
    """One-shot wrapper over make_sharded_fused_detector: places the
    inputs batch-sharded and runs the fused shard_map detect.

    images: (B, H, W) per-face stack; B must divide the mesh size.
    """
    n_dev = mesh.devices.size
    batch = images.shape[0]
    if batch % n_dev:
        raise ValueError(f"batch {batch} must divide the mesh ({n_dev})")
    spec3 = NamedSharding(mesh, P(axis_name, None, None))
    spec2 = NamedSharding(mesh, P(axis_name, None))
    images = jax.device_put(jnp.asarray(images), spec3)
    faceboxes = jax.device_put(jnp.asarray(faceboxes, jnp.float32), spec2)
    run = make_sharded_fused_detector(model, mesh, roi,
                                      axis_name=axis_name, max_ied=max_ied)
    return run(images, faceboxes)
