"""Fused Pallas HOG kernel, flat-pixel layout (the fast serving kernel).

Second-generation kernel; the sole Pallas HOG (the first-generation
(BB, S, S)-block kernel was retired in round 2 — its splat matmuls had
N = C = 5 output lanes, 4% MXU lane utilisation, and every elementwise op
ran on (S, S) -> (56, 128) padded tiles, 2.4x waste; docs/PERF_NOTES.md
records the measured comparison). This kernel flattens pixels into the
lane axis:

  * patches arrive as (B, S*S) rows — elementwise work pads 3025 -> 3072
    lanes (1.5% waste instead of 137%);
  * gradients use pltpu.roll by +-1 (x) and +-S (y); wrapped/border lanes
    need no mask because their splat weights are exactly zero (the
    reference's interior-only loops, hog.c:616-617);
  * the entire bilinear cell splat is ONE dot: the 2*O per-bin masked
    gradients are stacked on the sublane axis and contracted against a
    (S*S, C*C) combined tent matrix (K = 3025 deep — MXU-efficient);
  * the clamped 2x2-block energy sums of vl_hog_extract become a single
    (C*C, 4*C*C) 0/1/2-entry matrix M4 (clamped border cells double-count,
    exactly like the C's repeated indices), so block normalisation is one
    tiny dot + rsqrt;
  * output rows are written flat (BB, D*C*C) by a lane concat, cells
    cx-major, which IS the reference's Matlab order idx = d*C*C + cx*C +
    cy — no lane-padded (BB, D, C*C) tiles, no outside relayout.

Semantics identical to ops/hog.py (same reference-C goldens).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superviseddescent_tpu.ops.hog import (
    HogVariant, _orientation_vectors, hog_dimension, hog_num_cells,
)


@functools.lru_cache(maxsize=None)
def _flat_consts(size: int, cell_size: int, transposed: bool = False):
    """Precomputed constants for the flat kernel.

    Returns (w2, m4):
      w2: (S*S, C*C) combined tent weights, cells flattened CX-MAJOR
          (c = cx*C + cy) and border pixels zeroed. The zeroed border
          rows double as the gradient border mask: roll-wrapped border
          gradients contribute exactly 0 through the splat dot, so no
          separate interior mask is needed. With `transposed`, the pixel
          index is (x, y) row-major (patches arrive transposed from the
          sampler's x-first dot order) while the cell order stays the
          reference's Matlab order;
      m4: (C*C, 4*C*C) block-neighbourhood sum matrix: energy @ m4 gives the
          four 2x2-block energy sums (factor order 1..4 of hog.c:978-981)
          for every cell, with clamped-index double counting.
    """
    s, cs = size, cell_size
    c = hog_num_cells(s, cs)
    p = np.arange(s, dtype=np.float64)
    h = (p + 0.5) / cs - 0.5
    cc = np.arange(c, dtype=np.float64)
    w1d = np.maximum(0.0, 1.0 - np.abs(h[:, None] - cc[None, :]))  # (S, C)
    w1d[0, :] = 0.0
    w1d[-1, :] = 0.0
    # w2[p=(y,x), c=(cx,cy)] = wy[y,cy] * wx[x,cx], cx-major cells
    w2 = np.einsum("yc,xd->yxdc", w1d, w1d).reshape(s * s, c * c)
    if transposed:
        w2 = (w2.reshape(s, s, c * c).transpose(1, 0, 2)
              .reshape(s * s, c * c))

    def cid(cx, cy):
        return int(np.clip(cx, 0, c - 1)) * c + int(np.clip(cy, 0, c - 1))

    m4 = np.zeros((c * c, 4 * c * c), np.float32)
    # factor blocks (dx, dy) pairs relative to the cell, matching
    # factor1=UL, factor2=UR, factor3=LL, factor4=LR of hog.c:978-981
    blocks = [((-1, -1), (0, -1), (-1, 0), (0, 0)),
              ((0, -1), (1, -1), (0, 0), (1, 0)),
              ((-1, 0), (0, 0), (-1, 1), (0, 1)),
              ((0, 0), (1, 0), (0, 1), (1, 1))]
    for cx in range(c):
        for cy in range(c):
            out_c = cx * c + cy
            for i, offsets in enumerate(blocks):
                for (dx, dy) in offsets:
                    m4[cid(cx + dx, cy + dy), i * c * c + out_c] += 1.0
    return (w2.astype(np.float32), m4)


def _flat_kernel(p_ref, w2_ref, m4_ref, o_ref, g_scratch, *,
                 size, cell_size, num_orientations, variant, block, fast,
                 transposed):
    s = size
    o_count = num_orientations
    n_cells = hog_num_cells(s, cell_size)
    cc = n_cells * n_cells
    dtype = jnp.float32
    bb = block

    img = p_ref[:].astype(dtype)                         # (BB, P)

    # central differences via lane rolls. Wrapped/border lanes are NOT
    # masked: their w2 rows are exactly zero, so they contribute 0.0
    # through the splat dot (the reference's interior-only loops,
    # hog.c:616-617). pltpu.roll requires non-negative shifts:
    # roll by -k == roll by P-k. Transposed patches have pixel index
    # (x, y), so the +-1 rolls step y and the +-S rolls step x.
    pdim = s * s
    dx1, dxs = (pdim - s, s) if transposed else (pdim - 1, 1)
    dy1, dys = (pdim - 1, 1) if transposed else (pdim - s, s)
    gx = pltpu.roll(img, dx1, 1) - pltpu.roll(img, dxs, 1)
    gy = pltpu.roll(img, dy1, 1) - pltpu.roll(img, dys, 1)
    grad = jnp.sqrt(gx * gx + gy * gy)

    if fast and o_count == 4:
        # direct sector classification: the argmax over the 8 directed
        # bin scores is just "which multiple of pi/4 is the gradient
        # angle nearest to" — two slope comparisons pick the axis
        # (horizontal / vertical / one of the diagonals), the signs pick
        # the direction. ~2.5x fewer VPU passes than the score loop;
        # pixels exactly on a 22.5-degree sector boundary may resolve to
        # the other adjacent bin than the reference's first-max-wins
        # argmax (fast-mode noise class).
        ax = jnp.abs(gx)
        ay = jnp.abs(gy)
        px = gx >= 0
        py = gy >= 0
        bin_h = jnp.where(px, 0, 4)
        bin_v = jnp.where(py, 2, 6)
        bin_d = jnp.where(px == py, jnp.where(px, 1, 5),
                          jnp.where(py, 3, 7))
        t_lo = 0.41421356237  # tan(pi/8)
        t_hi = 2.41421356237  # tan(3*pi/8)
        best_bin = jnp.where(
            ay < ax * t_lo, bin_h,
            jnp.where(ay > ax * t_hi, bin_v, bin_d))
    else:
        # hard orientation assignment on unnormalised scores (argmax and
        # sign are invariant to the positive magnitude normalisation,
        # hog.c:645-672)
        ov = _orientation_vectors(o_count)
        best_score = jnp.zeros_like(grad)
        best_bin = jnp.full(grad.shape, -1, jnp.int32)
        for k in range(o_count):
            sc = gx * float(ov[0, k]) + gy * float(ov[1, k])
            neg = sc < 0
            a = jnp.abs(sc)
            bin_k = jnp.where(neg, k + o_count, k)
            upd = a > best_score
            best_score = jnp.where(upd, a, best_score)
            best_bin = jnp.where(upd, bin_k, best_bin)

    # stack per-bin masked gradients on the sublane axis, then ONE deep dot.
    # fast mode keeps the planes + dot in bf16 (halved scratch traffic +
    # bf16 MXU): gradients round to 8 mantissa bits, ~0.4% descriptor noise.
    # NB: keep the select in f32 and cast at the store — selecting on a
    # pre-cast bf16 grad measures ~25% slower (mask relayout for 16-bit
    # lanes beats the saved casts).
    g_dtype = g_scratch.dtype
    for o in range(2 * o_count):
        g_scratch[o * bb:(o + 1) * bb, :] = jnp.where(
            best_bin == o, grad, 0.0).astype(g_dtype)
    cells_all = jax.lax.dot_general(
        g_scratch[:], w2_ref[:].astype(g_dtype), (((1,), (0,)), ((), ())),
        precision=(jax.lax.Precision.DEFAULT if fast
                   else jax.lax.Precision.HIGHEST),
        preferred_element_type=dtype)                    # (2O*BB, C*C)

    ha = [cells_all[o * bb:(o + 1) * bb] for o in range(o_count)]
    hb = [cells_all[(o + o_count) * bb:(o + o_count + 1) * bb]
          for o in range(o_count)]

    energy = jnp.zeros((bb, cc), dtype)
    for k in range(o_count):
        f = ha[k] + hb[k]
        energy = energy + f * f

    fsums = jax.lax.dot_general(
        energy, m4_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=dtype)                    # (BB, 4*C*C)
    factors = [jax.lax.rsqrt(fsums[:, i * cc:(i + 1) * cc] + 1e-4)
               for i in range(4)]

    if variant == HogVariant.Uoctti:
        t_acc = [jnp.zeros((bb, cc), dtype) for _ in range(4)]
        channels = []
        hb_chan = []
        hc_chan = []
        for k in range(o_count):
            ha_s = jnp.zeros((bb, cc), dtype)
            hb_s = jnp.zeros((bb, cc), dtype)
            hc_s = jnp.zeros((bb, cc), dtype)
            for i in range(4):
                hai = factors[i] * ha[k]
                hbi = factors[i] * hb[k]
                hci = jnp.minimum(hai + hbi, 0.2)
                ha_s = ha_s + jnp.minimum(hai, 0.2)
                hb_s = hb_s + jnp.minimum(hbi, 0.2)
                hc_s = hc_s + hci
                t_acc[i] = t_acc[i] + hci
            channels.append(0.5 * ha_s)
            hb_chan.append(0.5 * hb_s)
            hc_chan.append(0.5 * hc_s)
        scale_t = float(np.float32(1.0) / np.sqrt(np.float32(18.0)))
        out_channels = (channels + hb_chan + hc_chan
                        + [t * scale_t for t in t_acc])
    else:
        out_channels = []
        for i in range(4):
            for k in range(o_count):
                out_channels.append(
                    jnp.minimum(factors[i] * (ha[k] + hb[k]), 0.2))

    # flat (BB, D*C*C) output via lane concat: avoids the 5x lane-padding a
    # (BB, D, C*C) tile layout would write, and the relayout copy the
    # outside reshape then needs
    o_ref[:, :] = jnp.concatenate(out_channels, axis=1)


@functools.partial(jax.jit, static_argnames=(
    "size", "cell_size", "num_orientations", "variant", "block", "fast",
    "transposed", "interpret"))
def hog_descriptor_pallas_flat(patches_flat: jnp.ndarray, size: int,
                               cell_size: int, num_orientations: int,
                               variant: HogVariant = HogVariant.Uoctti,
                               block: int = 0,
                               fast: bool = False,
                               transposed: bool = False,
                               interpret: bool = False) -> jnp.ndarray:
    """(B, S*S) row-major flattened patches -> (B, C*C*D) descriptors.

    fast=True keeps the masked gradient planes and the cell-splat dot in
    bf16 and classifies orientations by sector comparison instead of the
    score argmax: ~1.3x faster, ~0.4% relative descriptor noise
    (gradients round to 8 mantissa bits; exact sector-boundary pixels may
    bin differently). Exact mode (default) matches the C goldens bit-wise.
    transposed: patches are flattened (x, y)-major (the window sampler's
    transposed output); descriptors come out in the standard order.
    block: patch rows per grid step; 0 picks by measured sweep
    (scripts/sweep_hog_block.py on v5e): 512 for small patches, 256
    otherwise — larger blocks amortise the per-step VPU pipeline at the
    cost of scratch VMEM ((2*O*block, S*S) planes).
    Input dtype may be bf16 (lossless for quantized pixels, half the
    input stream); compute is f32 either way.
    """
    # Pallas TPU kernels only run interpreted on the CPU backend (tests,
    # debugging); auto-switch so the serving path is portable
    interpret = interpret or jax.default_backend() == "cpu"
    b, pdim = patches_flat.shape
    assert pdim == size * size
    if not block:
        block = 512 if pdim <= 1024 else 256
    n_cells = hog_num_cells(size, cell_size)
    cc = n_cells * n_cells
    dims = hog_dimension(variant, num_orientations)

    padded_b = -(-b // block) * block
    if padded_b != b:
        patches_flat = jnp.pad(patches_flat, ((0, padded_b - b), (0, 0)))

    w2, m4 = _flat_consts(size, cell_size, transposed)
    kernel = functools.partial(
        _flat_kernel, size=size, cell_size=cell_size,
        num_orientations=num_orientations, variant=variant, block=block,
        fast=fast, transposed=transposed)
    out = pl.pallas_call(
        kernel,
        grid=(padded_b // block,),
        in_specs=[
            pl.BlockSpec((block, pdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pdim, cc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cc, 4 * cc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, dims * cc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_b, dims * cc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * num_orientations * block, pdim),
                       jnp.bfloat16 if fast else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(patches_flat, jnp.asarray(w2), jnp.asarray(m4))
    return out[:b]
