"""Fused whole-cascade detection kernel (fourth-generation serving path).

ONE Pallas kernel runs the ENTIRE 4-level RCR cascade for a face per grid
step: per level, the L landmark patches are sampled from the VMEM-
resident face window (transposed tent dots, as ops/patches_pallas.py),
HOG-described in a lane-packed layout, assembled into the feature row,
and the regressor GEMV applied — the landmark estimate x never leaves
registers/VMEM between levels. The round-3 frames variant
(detect_cascade_fused_frames) additionally fuses the window CROP into
the kernel: uint8 frames stay in HBM and each grid step DMAs its faces'
windows from per-face origins — no XLA crop prologue, no bf16 window
HBM round-trip.

Why (measured, docs/PERF_NOTES.md roofline): the per-level pipeline is
floor-bound, not roofline-bound. Fusing removes, per batch of 1024 faces,
  * 3 of 4 window HBM re-streams (1.6 GB, ~2 ms),
  * every patch HBM round-trip between sampler and HOG (~1.5 ms),
  * 6 of 8 kernel dispatches plus the per-level jitted glue (~2 ms).

Layout design (every op proven individually on v5e Mosaic; sublane roll
hangs the compiler, so x-gradients use slice+concat):
  * patches live as (S, L*128) in VMEM: landmark lm's transposed patch
    occupies lanes [lm*128, lm*128+S) — the sampler's second dot emits
    an (S, 128) tile directly (its N axis pads to 128 on the MXU
    anyway), so every store is full-tile lane-aligned;
  * the cell splat is separable and BLOCK-DIAGONAL: stage A contracts
    patch-x with a (2O*C, 2O*S) block-diag tent (the 2O masked gradient
    planes stacked on sublanes), stage B contracts patch-y with a
    (L*128, 128) per-landmark block-diag tent — two dots replace the
    flat kernel's one deep dot while keeping the lane-packed layout
    legal (no (S,S)->(1,S*S) relayout exists in Mosaic);
  * the clamped 2x2 block-energy sums are separable too: a left
    block-diag x-sum and a right per-landmark block-diag (128, 128)
    y-sum per factor (clamping is per-axis, so border double-counting
    factors);
  * the HOG tail (energies, factors, channel math, feature-row
    assembly) is BATCHED across the G faces of a grid step: per-face
    (C, NS) cell histograms stack into (G*BR, NS) operands (BR = C
    sublane-tile-padded; NS = nseg*128 with nseg = ceil(L/(128//C))
    landmark segments — seg_packing — so models past 128 packed lanes,
    e.g. COFW-29 at 5 cells or ibug-68, serve through this same
    kernel), so the tail issues ~G x fewer VPU ops — the
    per-face variant measured op-issue-bound (PERF_NOTES stage
    ablation); the regressor weights are HOST-PERMUTED to the cx-major
    feature order (permute_weights), so each cell-x scatters one
    contiguous D*128-lane strip per face and the GEMV is one
    lanes-contracting dot.

Numerics: fast serving class only (bf16 dots, sector-comparison
orientation binning, quantised patches) — the same class as
make_stepped_detector(sampling='fast', window_sampler=True,
hog_fast=True); landmark deltas vs the exact path are sub-pixel
(README performance table).

Reference semantics reproduced: model.hpp:132-144 detect loop,
superviseddescent.hpp:323-344 per-level update, adaptive_vlhog.hpp
patch/HOG/flatten (via the host weight permutation), hog.c Uoctti
descriptor (channel math identical to ops/hog_pallas_flat.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superviseddescent_tpu.ops.hog import hog_num_cells
from superviseddescent_tpu.ops.patches_pallas import (
    LANE_ALIGN, SUBLANE_ALIGN, max_patch_half, max_patch_half_x)

SEG = 128          # lane segment per landmark / per feature-row block

#: landmark counts up to this sample with a statically unrolled landmark
#: loop (compile cost ~ 4 x L bodies x g_unroll, NOT x G); above it the
#: loop rolls into a fori_loop with one emitted body (one-hot scalar
#: extraction + dynamic pwide stores) so compile stays O(1) in L
LM_STATIC_MAX = 96

#: scoped-VMEM budget declared to Mosaic. v5e has 128 MiB of VMEM; the
#: f32 patch scratch (bit-identical, +7.5% throughput) pushed ibug-68's
#: frames-path demand to 100.9 MiB, so 112 MiB keeps that family inside
#: the budget while leaving 16 MiB of headroom for compiler internals.
VMEM_LIMIT = 112 * 1024 * 1024


def default_g_unroll(num_landmarks: int) -> int:
    """Faces per face-loop iteration (the compile/throughput knob).

    Measured v5e frontier at RCR-22, batch 3072 (scripts/probe_fused_g):
    each fori back-edge costs ~0.3 us, so throughput scales with
    batch x levels / g_unroll back-edges while Mosaic compile time
    scales with ~4 x L x g_unroll emitted sampler bodies:

      g_unroll=1  59.3 ms  12 s compile     (fully rolled)
      g_unroll=4  54.7 ms  73 s  (G=32)     <- default, beats the old
      old kernel  54.9 ms  419 s (G=12)        fully-unrolled design

    Large landmark counts halve the unroll to keep the compile budget
    (ibug-68 at 4 x 68 x 2 bodies compiles in minutes, not the old
    >30 min cliff that forced G=4)."""
    return 4 if num_landmarks <= 32 else 2


def default_faces_per_step(num_landmarks: int) -> int:
    """G (faces per grid step) no longer affects compile time, only VMEM
    footprint and amortisation: bigger G amortises the batched HOG tail
    and the GEMV M-tile (measured @3072: G=12 56.6 / G=16 55.6 /
    G=24 55.2 / G=32 54.7 ms at g_unroll=4). 68-landmark models halve G
    to keep the VMEM-resident weight tuple + window scratch under the
    100 MB budget."""
    return 32 if num_landmarks <= 32 else 16


def seg_packing(num_landmarks: int, num_cells: int):
    """Multi-segment lane packing: (landmarks_per_segment, num_segments).

    Each SEG(=128)-lane segment packs whole landmarks only (a landmark's
    C cell-columns never straddle a segment boundary), so a segment
    holds lps = SEG // C landmarks and a model needs ceil(L / lps)
    segments. Landmark lm's cell-column cy lives at lane
    (lm // lps)*SEG + (lm % lps)*C + cy; every HOG-tail operand and
    feature-row block is nseg*SEG lanes wide. nseg == 1 reproduces the
    original single-segment layout bit-for-bit (same lanes, same
    compact column order)."""
    lps = SEG // num_cells
    return lps, -(-num_landmarks // lps)

# Tag for the kernel's compact feature-column order, stamped into
# mid-train checkpoints of fused-backend runs (io/checkpoint.py) so a
# kernel column-order change can never silently scramble a resumed run.
# BUMP THIS whenever permute_weights / compact_to_standard_rows change
# their enumeration. v2 = cx-major blocks ((cx*D+d) outer, (lm, cy)
# inner, bias last); v1 was (d*C+cx)-major. The round-3 multi-segment
# packing (seg_packing) keeps the v2 compact enumeration bit-for-bit
# (segments concatenate in landmark order), so v2 stands.
KERNEL_FEATURE_ORDER = "kernel-cx-v2"


def _w1d(size: int, cell_size: int) -> np.ndarray:
    """(S, C) 1-D cell tent with zeroed border pixels — the shared
    tent from ops/hog.py so any parity fix there reaches this kernel."""
    from superviseddescent_tpu.ops.hog import _cell_weights
    return _cell_weights(size, cell_size)


def validate_fused_config(num_landmarks: int, num_cells: int,
                          num_bins: int, variant) -> None:
    """Raise a clear error for configs the fused kernel cannot serve.

    Invariants baked into the kernel layout/math:
      * lane packing: whole landmarks per SEG(=128)-lane segment
        (seg_packing) — a landmark's C cell-columns must fit one
        segment, so num_cells <= SEG; any landmark count is served via
        multi-segment packing (nseg = ceil(L / (SEG // C)) segments);
      * the fast sector binning hard-codes 8 sectors -- tan(pi/8)
        comparisons -- i.e. num_bins == 4 (hog.c orientation assignment
        for O=4; the flat kernel falls back to argmax for other O,
        hog_pallas_flat.py, but this kernel has no slow path);
      * Uoctti channel math only.
    """
    from superviseddescent_tpu.ops.hog import HogVariant
    if variant != HogVariant.Uoctti:
        raise ValueError("fused kernel supports the Uoctti variant only")
    if num_bins != 4:
        raise ValueError(
            "fused kernel's sector orientation binning is specialised to "
            f"num_bins=4 (8 sectors); got num_bins={num_bins} — use the "
            "window/dense backend for other bin counts")
    if num_cells > SEG:
        raise ValueError(
            f"fused kernel packs a landmark's {num_cells} cell-columns "
            f"into one {SEG}-lane segment: num_cells must be <= {SEG} — "
            "use the window/dense backend for larger cell grids")


def _block_rows(num_cells: int) -> int:
    """Sublane rows per face block in the batched-tail scratch: the cell
    rows of one face, padded up to the (8, 128) sublane tile so every
    per-face store lands tile-aligned."""
    return -(-num_cells // SUBLANE_ALIGN) * SUBLANE_ALIGN


@functools.lru_cache(maxsize=None)
def _splat_consts(levels, cell_sizes, num_orientations: int,
                  num_landmarks: int, g_faces: int):
    """Stacked per-level separable splat + block-sum constants.

    Returns numpy arrays (lanes COMPACT — patches are stored at stride S,
    not SEG; unaligned static lane stores are legal and the compact
    layout keeps both the VPU tiles and the splat-dot lane dims free of
    2.3x padding waste). NS = nseg*SEG (seg_packing lane width):
      wx_all (R, S_max, C)        per-level 1-D x tents,
      wy_all (R, L*S_max, NS)     per-landmark block-diag y-tents
                                  (rows packed at the level's own S),
      rx_all (2, G*BR, G*BR)      clamped x block-sum pair, block-diag
                                  over the G faces of a grid step (the
                                  batched HOG tail stacks faces on
                                  sublanes at BR-row blocks),
      ry_all (2, NS, NS)          per-landmark block-diag y block-sums.
    """
    o = num_orientations
    l = num_landmarks
    r = len(levels)
    s_max = max(lv[0] for lv in levels)
    c = hog_num_cells(levels[0][0], cell_sizes[0])
    lps, nseg = seg_packing(l, c)
    lane0 = [(lm // lps) * SEG + (lm % lps) * c for lm in range(l)]
    del o  # x-tents are shared across orientation planes
    wx_all = np.zeros((r, s_max, c), np.float32)
    wy_all = np.zeros((r, l * s_max, nseg * SEG), np.float32)
    for li, (s, _, _, _) in enumerate(levels):
        w1 = _w1d(s, cell_sizes[li])
        wx_all[li, 0:s, :] = w1
        for lm in range(l):
            wy_all[li, lm * s:lm * s + s, lane0[lm]:lane0[lm] + c] = w1

    br = _block_rows(c)
    gb = g_faces * br
    rx_all = np.zeros((2, gb, gb), np.float32)
    ry_all = np.zeros((2, nseg * SEG, nseg * SEG), np.float32)
    for ai, a in enumerate((-1, 0)):
        ry = np.zeros((c, c), np.float32)
        for cx in range(c):
            for d in (a, a + 1):
                cn = int(np.clip(cx + d, 0, c - 1))
                for g in range(g_faces):
                    rx_all[ai, g * br + cx, g * br + cn] += 1.0
                ry[cn, cx] += 1.0
        for lm in range(l):
            ry_all[ai, lane0[lm]:lane0[lm] + c,
                   lane0[lm]:lane0[lm] + c] = ry
    return wx_all, wy_all, rx_all, ry_all


def permute_weights(weights: np.ndarray, num_landmarks: int,
                    num_cells: int, dims: int) -> np.ndarray:
    """Reorder an (F, P) regressor into the kernel's padded feature order.

    Input rows follow the reference's Matlab flatten
    idx = lm*(D*C*C) + d*C*C + cx*C + cy, bias last
    (adaptive_vlhog.hpp:166-183). Output (P, (D*C*NSEG+1)*SEG), where
    NSEG = seg_packing segments: column
    ((cx*D+d)*NSEG + lm//lps)*SEG + (lm%lps)*C + cy holds input row
    idx; bias at lane D*C*NSEG*SEG; pad lanes zero. The block order is
    cx-MAJOR (cell-x outer, descriptor-channel inner, segment innermost)
    so the batched HOG tail can write one face-row's D*NSEG*SEG feature
    lanes contiguously per cell-x.
    """
    l, c, d = num_landmarks, num_cells, dims
    lps, nseg = seg_packing(l, c)
    f, p = weights.shape
    assert f == l * d * c * c + 1, (f, l, d, c)
    out = np.zeros((p, (d * c * nseg + 1) * SEG), weights.dtype)
    dd, cx, lm, cy = np.meshgrid(np.arange(d), np.arange(c),
                                 np.arange(l), np.arange(c), indexing="ij")
    src = (lm * (d * c * c) + dd * c * c + cx * c + cy).ravel()
    dst = (((cx * d + dd) * nseg + lm // lps) * SEG
           + (lm % lps) * c + cy).ravel()
    out[:, dst] = weights[src].T
    out[:, d * c * nseg * SEG] = weights[f - 1]
    return out


def _sample_level_batch(win_ref, x_ref, iedscr, wx_ref, wy_ref,
                        gscr, pscr, pwide, bscr, *, li, s, w, wx, ry_n,
                        rx_n, num_landmarks, o_count, g_faces, rel_patch,
                        cell_size, r_idx, l_idx, g_unroll=1,
                        quantize=True, probe=None):
    """Sample + splat-describe ONE level for ALL G faces of the grid
    step, with fori_loops over faces and landmarks so the compiled body
    count is INDEPENDENT of G and L (VERDICT r3 item 2: the unrolled
    G x L sampler bodies made Mosaic compile time scale 151/238/419 s at
    G=8/10/12 and forced ibug-68 down to G=4). Per landmark, the x
    scalars are extracted with a one-hot lane reduction (dynamic lane
    extracts are illegal on Mosaic), the patch is sampled from a
    dynamically indexed face window, and the (S, SEG) transposed patch
    lands at pwide[lm] — a dynamic-leading-index store. After the
    landmark loop, L static copies compact pwide into the stride-S
    lane-packed pscr the HOG chain reads (the chain itself is emitted
    once per level; all ops probed on v5e Mosaic, scripts/probe_dyn.py).

    x_ref: (G, 1, 2L) f32 ref (input block or the cascade's xcur
    scratch), WINDOW coordinates. Per-face IEDs land in iedscr (G, 1, 1)
    for the caller's batched GEMV update.

    probe: measurement hook (scripts/probe_fused.py) — 'sample' stops
    after the patch-sampling loop (stage-ablation timing); output is
    garbage in probe modes."""
    l = num_landmarks
    l2 = 2 * l
    c = hog_num_cells(s, cell_size)
    lp = l * s          # compact patch lanes: landmark stride = S
    br = _block_rows(c)
    gb = g_faces * br

    ph_cap = max_patch_half(w)
    if wx != rx_n:
        ph_cap = min(ph_cap, max_patch_half_x(wx))

    j = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(jnp.float32)
    # padded row iota for the (SEG, W) y-tent: rows >= s are masked to
    # zero so the sampler's second dot emits the (S, SEG) stored tile
    # directly (the MXU pads its N axis to 128 anyway — free)
    jp = jax.lax.broadcasted_iota(jnp.int32, (SEG, 1), 0)
    jpf = jp.astype(jnp.float32)
    uy = jax.lax.broadcasted_iota(jnp.int32, (SEG, w), 1).astype(jnp.float32)
    uy_s = jax.lax.broadcasted_iota(jnp.int32, (s, w), 1).astype(jnp.float32)
    ux = jax.lax.broadcasted_iota(jnp.int32, (s, wx), 1).astype(jnp.float32)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, l2), 1)
    w1x = wx_ref[li, 0:s, :].astype(jnp.bfloat16)               # (S, C)

    def one_face(g):
        row = x_ref[g]                                          # (1, 2L)

        # ---- IED + patch half (static extracts from the x row) ---- #
        rex = sum(row[0, i] for i in r_idx) / len(r_idx)
        rey = sum(row[0, i + l] for i in r_idx) / len(r_idx)
        lex = sum(row[0, i] for i in l_idx) / len(l_idx)
        ley = sum(row[0, i + l] for i in l_idx) / len(l_idx)
        ied = jnp.sqrt((rex - lex) ** 2 + (rey - ley) ** 2)
        iedscr[g] = jnp.full((1, 1), ied, jnp.float32)
        phw = jnp.maximum(jnp.floor(rel_patch * ied / 2.0 + 0.5), 1.0)
        phw = jnp.minimum(phw, ph_cap)
        st = 2.0 * phw / s

        src = jnp.clip((j + 0.5) * st - 0.5, 0.0, 2.0 * phw - 1.0)  # (S,1)
        src0 = src[0, 0]
        srcp = jnp.clip((jpf + 0.5) * st - 0.5, 0.0, 2.0 * phw - 1.0)

        def sample_patch(cxs, cys, padded):
            """One landmark's transposed-patch sampling. padded=True
            emits an (S, SEG) tile (SEG-row y-tent, rows >= s masked)
            for the dynamic pwide store; padded=False the plain (S, S)
            tile for a static pscr store. Identical values either way —
            the MXU pads its N axis to 128 regardless."""
            by = cys - phw
            bx = cxs - phw
            oy = jnp.clip(jnp.floor(by + src0), 0.0, float(ry_n - w)
                          ).astype(jnp.int32)
            oy = pl.multiple_of((oy // SUBLANE_ALIGN) * SUBLANE_ALIGN,
                                SUBLANE_ALIGN)
            if wx == rx_n:
                sub = win_ref[g, pl.ds(oy, w), :]               # (W, RX)
                ox = jnp.float32(0.0)
            else:
                oxi = jnp.clip(jnp.floor(bx + src0), 0.0, float(rx_n - wx)
                               ).astype(jnp.int32)
                oxi = pl.multiple_of((oxi // LANE_ALIGN) * LANE_ALIGN,
                                     LANE_ALIGN)
                sub = win_ref[g, pl.ds(oy, w), pl.ds(oxi, wx)]  # (W, WX)
                ox = oxi.astype(jnp.float32)

            cxv = bx + src - ox                                 # (S,1)
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(cxv - ux)
                             ).astype(jnp.bfloat16)             # (S, WX)
            if padded:
                cyv = by + srcp - oy.astype(jnp.float32)        # (SEG,1)
                ty = jnp.where(jp < s,
                               jnp.maximum(0.0, 1.0 - jnp.abs(cyv - uy)),
                               0.0).astype(jnp.bfloat16)        # (SEG, W)
            else:
                cyv = by + src - oy.astype(jnp.float32)         # (S,1)
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(cyv - uy_s)
                                 ).astype(jnp.bfloat16)         # (S, W)
            # transposed order: q = tx . sub^T (S, W); patch^T = q . ty^T
            q = jax.lax.dot_general(
                tx, sub, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            patch = jax.lax.dot_general(
                q.astype(jnp.bfloat16), ty, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if quantize:
                # reference parity: cv::resize writes uint8 patches
                # (adaptive_vlhog.hpp:154-155) — round + clamp here
                patch = jnp.clip(jnp.floor(patch + 0.5), 0.0, 255.0)
            # f32 return/store: quantised values are integers <= 255, so
            # an f32 pscr is BIT-IDENTICAL to the old bf16 one while
            # skipping the store-side bf16 cast and the HOG chain's
            # read-side f32 cast (2 VPU passes per level)
            return patch

        # ---- sample the L patches ---- #
        if l <= LM_STATIC_MAX:
            # statically unrolled landmarks (compile cost ~ 4 x L bodies,
            # NOT x G — the face loop stays a fori): static x extracts,
            # direct stride-S stores, no pwide round-trip
            for lm in range(l):
                pscr[0:s, lm * s:(lm + 1) * s] = sample_patch(
                    jnp.round(row[0, lm]), jnp.round(row[0, lm + l]),
                    False)
        else:
            # rolled landmark loop (body emitted ONCE; compile O(1)
            # in L): x scalars via one-hot lane reductions, patches via
            # dynamic-leading pwide stores + L static compaction copies
            def lm_body(lm, _):
                cxs = jnp.round(jnp.sum(jnp.where(iota_l == lm, row, 0.0)))
                cys = jnp.round(jnp.sum(jnp.where(iota_l == lm + l, row,
                                                  0.0)))
                pwide[lm, 0:s, :] = sample_patch(cxs, cys, True)
                return 0

            jax.lax.fori_loop(0, l, lm_body, 0, unroll=False)
            # compact the SEG-stride landings into the stride-S packing
            # (static unaligned lane stores are legal; L copies per level)
            for lm in range(l):
                pscr[0:s, lm * s:(lm + 1) * s] = pwide[lm, 0:s, 0:s]

        if probe == "sample":
            return 0

        # ---- HOG over all L patches at once: (S, L*S) lane-packed ---- #
        img = pscr[0:s, 0:lp]                                   # (S, LP)
        zrow = jnp.zeros((1, lp), jnp.float32)
        # x-gradient: sublane shifts via slice+concat; border rows are
        # zero-splat so their values are moot
        gx = jnp.concatenate([zrow, img[2:s, :] - img[0:s - 2, :], zrow], 0)
        # y-gradient: lane rolls; segment-crossing wraps land on
        # zero-weight border pixels (and zero pad lanes) — no masking
        gy = pltpu.roll(img, lp - 1, 1) - pltpu.roll(img, 1, 1)
        grad = jnp.sqrt(gx * gx + gy * gy)

        # fast sector classification (ops/hog_pallas_flat.py fast mode)
        ax = jnp.abs(gx)
        ay = jnp.abs(gy)
        px = gx >= 0
        py = gy >= 0
        bin_h = jnp.where(px, 0, 4)
        bin_v = jnp.where(py, 2, 6)
        bin_d = jnp.where(px == py, jnp.where(px, 1, 5),
                          jnp.where(py, 3, 7))
        t_lo = 0.41421356237   # tan(pi/8)
        t_hi = 2.41421356237   # tan(3*pi/8)
        best_bin = jnp.where(ay < ax * t_lo, bin_h,
                             jnp.where(ay > ax * t_hi, bin_v, bin_d))

        for o in range(2 * o_count):
            gscr[o * s:(o + 1) * s, 0:lp] = jnp.where(
                best_bin == o, grad, 0.0).astype(jnp.bfloat16)

        # separable splat: per-plane x-tent contractions (2O small dots —
        # a single (2O*S, 2O*C) block-diagonal dot was MEASURED no
        # faster, 75.5 -> 77.2 ms at the bench config), then ONE
        # per-landmark block-diag y contraction
        planes = [jax.lax.dot_general(
            w1x, gscr[o * s:(o + 1) * s, 0:lp],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            for o in range(2 * o_count)]                        # (C, LP)
        a_all = jnp.concatenate(planes, axis=0)                 # (2OC, LP)
        b_all = jax.lax.dot_general(                            # (2OC, NS)
            a_all.astype(jnp.bfloat16),
            wy_ref[li, 0:lp, :].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        # ---- scatter into the batched-tail scratch ---- #
        # bscr is plane-major: plane k's G face blocks live at sublane
        # rows [k*G*BR + g*BR, ... + C) (BR = C padded to the sublane
        # tile, so every dynamic store start is provably tile-aligned).
        # _hog_tail runs the normalisation/channel math once per grid
        # step on (G*BR, NS) operands (the per-face variant measured
        # op-issue-bound, PERF_NOTES stage ablation).
        for k in range(2 * o_count):
            off = pl.multiple_of(k * gb + g * br, SUBLANE_ALIGN)
            bscr[pl.ds(off, c), :] = b_all[k * c:(k + 1) * c, :]

    # fori back-edges cost ~0.3 us each on v5e (measured: the fully
    # rolled kernel lost exactly back_edges x 0.3 us vs the unrolled
    # one), so the face loop processes g_unroll faces per iteration:
    # compiled body count scales with g_unroll (NOT with G), back-edge
    # count with G / g_unroll — a tunable continuum between the old
    # fully-unrolled kernel (compile minutes) and the fully rolled one
    # (~12 s compile, -8% throughput). See default_g_unroll.
    ku = min(g_unroll, g_faces)
    while g_faces % ku:
        ku -= 1

    def face_group(gq, _):
        for dj in range(ku):
            one_face(gq * ku + dj)
        return 0

    jax.lax.fori_loop(0, g_faces // ku, face_group, 0, unroll=False)


def _hog_tail(bscr, cscr, fscr, rx_ref, ry_ref, *, g_faces, c, o_count,
              dims):
    """Batched HOG normalisation + channel math for the G faces of one
    grid step: block energies, the four clamped block-sum factors, the
    Uoctti channel construction, and the feature-row scatter — all on
    (G*BR, NS) stacked operands instead of per-face (C, NS) tiles
    (NS = nseg*SEG, the seg_packing lane width).

    bscr pad rows (C..BR of each face block) must be ZERO: they ride
    through the energy/factor dots (the block-diag rx has zero columns
    there, so zeros stay inert) and are never selected into fscr."""
    br = _block_rows(c)
    gb = g_faces * br
    ns = bscr.shape[1]
    ha = [bscr[k * gb:(k + 1) * gb, :] for k in range(o_count)]
    hb = [bscr[(k + o_count) * gb:(k + o_count + 1) * gb, :]
          for k in range(o_count)]
    energy = jnp.zeros((gb, ns), jnp.float32)
    for k in range(o_count):
        f_ = ha[k] + hb[k]
        energy = energy + f_ * f_

    # factor blocks (hog.c:978-981): (x-sum, y-sum) index pairs
    # f1 = (-1,-1)  f2 = (0,-1)  f3 = (-1,0)  f4 = (0,0)
    factors = []
    for (aix, aiy) in ((0, 0), (1, 0), (0, 1), (1, 1)):
        fs = jax.lax.dot_general(
            rx_ref[aix, :, :], energy, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        fs = jax.lax.dot_general(
            fs, ry_ref[aiy, :, :], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        factors.append(jax.lax.rsqrt(fs + 1e-4))

    # Uoctti channel math (identical to ops/hog_pallas_flat.py)
    t_acc = [jnp.zeros((gb, ns), jnp.float32) for _ in range(4)]
    ch_a, ch_b, ch_c = [], [], []
    for k in range(o_count):
        ha_s = jnp.zeros((gb, ns), jnp.float32)
        hb_s = jnp.zeros((gb, ns), jnp.float32)
        hc_s = jnp.zeros((gb, ns), jnp.float32)
        for i in range(4):
            hai = factors[i] * ha[k]
            hbi = factors[i] * hb[k]
            hci = jnp.minimum(hai + hbi, 0.2)
            ha_s = ha_s + jnp.minimum(hai, 0.2)
            hb_s = hb_s + jnp.minimum(hbi, 0.2)
            hc_s = hc_s + hci
            t_acc[i] = t_acc[i] + hci
        ch_a.append(0.5 * ha_s)
        ch_b.append(0.5 * hb_s)
        ch_c.append(0.5 * hc_s)
    scale_t = float(np.float32(1.0) / np.sqrt(np.float32(18.0)))
    out_channels = ch_a + ch_b + ch_c + [t * scale_t for t in t_acc]
    assert len(out_channels) == dims

    # ---- feature-row scatter: channels -> cscr, then one exact
    # selection dot per cell-x picks each face's row (the cx-major
    # feature order makes the destination lanes contiguous) ---- #
    for d in range(dims):
        cscr[:, d * ns:(d + 1) * ns] = out_channels[d]
    cs = cscr[:, :]
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (g_faces, gb), 0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (g_faces, gb), 1)
    for cx in range(c):
        sel = jnp.where(iota_r == iota_g * br + cx, 1.0, 0.0)
        rows = jax.lax.dot_general(
            sel, cs, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (G, D*NS)
        fscr[0:g_faces, cx * dims * ns:(cx + 1) * dims * ns] = rows
    # (the bias segment is written once by the caller)


def _cascade_body(x0_ref, win_ref, w_refs,
                  wx_ref, wy_ref, rx_ref, ry_ref, o_ref,
                  gscr, pscr, pwide, fscr, bscr, cscr, xcur, iedscr, *,
                  levels, g_faces, ry_n, rx_n, num_landmarks, o_count,
                  dims, cell_sizes, r_idx, l_idx, g_unroll=1,
                  quantize=True, probe=None):
    """The shared cascade loop: win_ref is any (G, RY, RX) bf16 ref —
    a pipelined input block (_cascade_kernel) or the in-kernel-cropped
    window scratch (_cascade_frames_kernel). The landmark rows live in
    the xcur scratch between levels (the sampler's face fori_loop needs
    a dynamically indexable ref, not per-face values); per-level updates
    are one static vector op over all G faces."""
    c = hog_num_cells(levels[0][0], cell_sizes[0])
    # bias segment (the LAST SEG lanes): ones, once (every other segment
    # is fully rewritten per level per face)
    kdim = fscr.shape[1]
    fscr[:, kdim - SEG:kdim] = jnp.ones((g_faces, SEG), jnp.float32)
    # zero bscr once: its pad rows (C..BR of each face block) are never
    # stored to, and uninitialised VMEM could hold NaN patterns that the
    # tail's energy squares would otherwise propagate
    @pl.when(pl.program_id(0) == 0)
    def _init_bscr():
        bscr[:, :] = jnp.zeros(bscr.shape, jnp.float32)

    xcur[:, :, :] = x0_ref[:, :, :]
    for li, (s, w, wx, rel) in enumerate(levels):
        _sample_level_batch(
            win_ref, xcur, iedscr, wx_ref, wy_ref, gscr, pscr, pwide,
            bscr, li=li, s=s, w=w, wx=wx, ry_n=ry_n, rx_n=rx_n,
            num_landmarks=num_landmarks, o_count=o_count,
            g_faces=g_faces, rel_patch=rel, cell_size=cell_sizes[li],
            r_idx=r_idx, l_idx=l_idx, g_unroll=g_unroll,
            quantize=quantize, probe=probe)
        if probe == "sample":
            continue
        _hog_tail(bscr, cscr, fscr, rx_ref, ry_ref, g_faces=g_faces,
                  c=c, o_count=o_count, dims=dims)
        if probe == "nogemv":
            continue
        # batched regressor GEMV: M = G faces per step amortises the
        # MXU's M-tile padding (an M=1 per-face GEMV measured ~10% of
        # the whole cascade in pure padding waste)
        upd = jax.lax.dot_general(
            fscr[:, :].astype(jnp.bfloat16), w_refs[li][:, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (G, 2L)
        # norm is 1/IED (model.hpp:94-98): dividing the update by it
        # means multiplying by the IED (superviseddescent.hpp:337-341)
        xcur[:, 0, :] = xcur[:, 0, :] - upd * iedscr[:, 0, :]
    o_ref[:, :, :] = xcur[:, :, :]


def _cascade_kernel(x0_ref, win_ref, w0, w1, w2, w3,
                    wx_ref, wy_ref, rx_ref, ry_ref, o_ref,
                    gscr, pscr, pwide, fscr, bscr, cscr, xcur, iedscr, *,
                    levels, g_faces, ry_n, rx_n, num_landmarks, o_count,
                    dims, cell_sizes, r_idx, l_idx, g_unroll=1,
                    quantize=True, probe=None):
    _cascade_body(x0_ref, win_ref, [w0, w1, w2, w3][:len(levels)],
                  wx_ref, wy_ref, rx_ref, ry_ref, o_ref,
                  gscr, pscr, pwide, fscr, bscr, cscr, xcur, iedscr,
                  levels=levels, g_faces=g_faces, ry_n=ry_n, rx_n=rx_n,
                  num_landmarks=num_landmarks, o_count=o_count, dims=dims,
                  cell_sizes=cell_sizes, r_idx=r_idx, l_idx=l_idx,
                  g_unroll=g_unroll, quantize=quantize, probe=probe)


def _crop_windows_dma(idx_ref, oy_ref, ox_ref, frames_ref, u8scr, winscr,
                      dsems, g_faces):
    """In-kernel window crop: DMA the G faces' uint8 windows straight
    out of the HBM-resident frame stack at per-face (frame, row, col)
    origins, then run the u8 -> f32 -> bf16 cast chain (u8 cannot cast
    straight to bf16 on Mosaic). fori_loops keep the emitted body count
    independent of G."""
    step = pl.program_id(0)
    ry_n, rx_n = u8scr.shape[1], u8scr.shape[2]

    def _src(g):
        # the caller aligned the origins to the FRAME_*_ALIGN grains;
        # Mosaic needs the proof annotation to slice the tiled HBM ref
        oyv = pl.multiple_of(oy_ref[step, g], FRAME_ROW_ALIGN)
        oxv = pl.multiple_of(ox_ref[step, g], FRAME_COL_ALIGN)
        return frames_ref.at[idx_ref[step, g], pl.ds(oyv, ry_n),
                             pl.ds(oxv, rx_n)]

    def _start(g, _):
        pltpu.make_async_copy(_src(g), u8scr.at[g], dsems.at[g]).start()
        return 0

    def _wait(g, _):
        pltpu.make_async_copy(_src(g), u8scr.at[g], dsems.at[g]).wait()
        winscr[g, :, :] = u8scr[g, :, :].astype(jnp.int32).astype(
            jnp.float32).astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, g_faces, _start, 0, unroll=False)
    jax.lax.fori_loop(0, g_faces, _wait, 0, unroll=False)


def _cascade_frames_kernel(idx_ref, oy_ref, ox_ref, x0_ref, frames_ref,
                           w0, w1, w2, w3,
                           wx_ref, wy_ref, rx_ref, ry_ref, o_ref,
                           u8scr, winscr, gscr, pscr, pwide, fscr, bscr,
                           cscr, xcur, iedscr, dsems, *,
                           levels, g_faces, ry_n, rx_n, num_landmarks,
                           o_count, dims, cell_sizes, r_idx, l_idx,
                           g_unroll=1, quantize=True, probe=None):
    """Cascade kernel with the window crop fused IN: per grid step, the
    G faces' uint8 windows are DMA'd straight out of the HBM-resident
    frame stack at per-face (frame, row, col) origins — the XLA crop
    prologue (per-face gather + bf16 window write + kernel re-read,
    ~18 ms/batch-4096, PERF_NOTES) disappears, and the window traffic
    the kernel does read is uint8, half the bf16 bytes."""
    _crop_windows_dma(idx_ref, oy_ref, ox_ref, frames_ref, u8scr, winscr,
                      dsems, g_faces)
    _cascade_body(x0_ref, winscr, [w0, w1, w2, w3][:len(levels)],
                  wx_ref, wy_ref, rx_ref, ry_ref, o_ref,
                  gscr, pscr, pwide, fscr, bscr, cscr, xcur, iedscr,
                  levels=levels, g_faces=g_faces, ry_n=ry_n, rx_n=rx_n,
                  num_landmarks=num_landmarks, o_count=o_count, dims=dims,
                  cell_sizes=cell_sizes, r_idx=r_idx, l_idx=l_idx,
                  g_unroll=g_unroll, quantize=quantize, probe=probe)


def _features_kernel(x0_ref, win_ref, wx_ref, wy_ref, rx_ref, ry_ref,
                     o_ref, gscr, pscr, pwide, bscr, cscr, iedscr, *,
                     level, g_faces, ry_n, rx_n, num_landmarks, o_count,
                     dims, cell_size, r_idx, l_idx, g_unroll=1):
    """One level's fused sample+HOG feature extraction for G faces per
    grid step; feature rows land directly in the output block (which
    plays the fscr role of _hog_tail)."""
    s, w, wx, rel = level
    c = hog_num_cells(s, cell_size)
    kdim = o_ref.shape[1]
    o_ref[:, kdim - SEG:kdim] = jnp.ones((g_faces, SEG), jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init_bscr():
        bscr[:, :] = jnp.zeros(bscr.shape, jnp.float32)

    _sample_level_batch(
        win_ref, x0_ref, iedscr, wx_ref, wy_ref, gscr, pscr, pwide,
        bscr, li=0, s=s, w=w, wx=wx, ry_n=ry_n, rx_n=rx_n,
        num_landmarks=num_landmarks, o_count=o_count, g_faces=g_faces,
        rel_patch=rel, cell_size=cell_size, r_idx=r_idx, l_idx=l_idx,
        g_unroll=g_unroll)
    _hog_tail(bscr, cscr, o_ref, rx_ref, ry_ref, g_faces=g_faces,
              c=c, o_count=o_count, dims=dims)


@functools.partial(jax.jit, static_argnames=(
    "level", "cell_size", "num_orientations", "dims", "r_idx", "l_idx",
    "faces_per_step", "g_unroll", "interpret"))
def extract_features_fused(windows: jnp.ndarray,
                           x: jnp.ndarray,
                           level,
                           cell_size: int,
                           num_orientations: int,
                           dims: int,
                           r_idx,
                           l_idx,
                           faces_per_step: int = None,
                           g_unroll: int = None,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused sample+HOG feature extraction for ONE cascade level (the
    training hot loop): per-face windows in, (N, (D*C*NSEG+1)*SEG) padded
    feature rows out, in the kernel's COLUMN ORDER (compact with
    compact_feature_columns; map weights back with
    compact_to_standard_rows). ~an order of magnitude faster than the
    separate sampler + HOG kernels at training batch sizes — no patch
    HBM round-trip, no per-chunk glue.

    windows: (N, RY, RX) bf16 per-sample face windows (uint8/f32 cast).
    x: (N, 2L) f32 current landmark rows in WINDOW coordinates.
    level: (S, W, WX, relative_patch_size); WX == RX means full width.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    n, ry_n, rx_n = windows.shape
    l2 = x.shape[1]
    l = l2 // 2
    if faces_per_step is None:
        faces_per_step = default_faces_per_step(l)
    if g_unroll is None:
        g_unroll = default_g_unroll(l)
    g = min(faces_per_step, n)
    if windows.dtype != jnp.bfloat16:
        windows = windows.astype(jnp.bfloat16)
    n_pad = -(-n // g) * g
    if n_pad != n:
        windows = jnp.concatenate(
            [windows, jnp.tile(windows[:1], (n_pad - n, 1, 1))])
        x = jnp.concatenate([x, jnp.tile(x[:1], (n_pad - n, 1))])

    s = level[0]
    lp = l * s
    c = hog_num_cells(s, cell_size)
    br = _block_rows(c)
    _, nseg = seg_packing(l, c)
    kdim = (dims * c * nseg + 1) * SEG
    wx_all, wy_all, rx_all, ry_all = _splat_consts(
        (tuple(level),), (cell_size,), num_orientations, l, g)
    kernel = functools.partial(
        _features_kernel, level=tuple(level), g_faces=g, ry_n=ry_n,
        rx_n=rx_n, num_landmarks=l, o_count=num_orientations, dims=dims,
        cell_size=cell_size, r_idx=tuple(r_idx), l_idx=tuple(l_idx),
        g_unroll=g_unroll)

    const_spec = lambda shape: pl.BlockSpec(        # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // g,),
        in_specs=[
            pl.BlockSpec((g, 1, l2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, ry_n, rx_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(wx_all.shape),
            const_spec(wy_all.shape),
            const_spec(rx_all.shape),
            const_spec(ry_all.shape),
        ],
        out_specs=pl.BlockSpec((g, kdim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, kdim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * num_orientations * s, lp), jnp.bfloat16),
            pltpu.VMEM((s, lp), jnp.float32),
            pltpu.VMEM((l, s, SEG) if l > LM_STATIC_MAX
                       else (1, 1, SEG), jnp.float32),
            pltpu.VMEM((2 * num_orientations * g * br, nseg * SEG),
                       jnp.float32),
            pltpu.VMEM((g * br, dims * nseg * SEG), jnp.float32),
            pltpu.VMEM((g, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x.astype(jnp.float32)[:, None, :], windows,
      jnp.asarray(wx_all), jnp.asarray(wy_all),
      jnp.asarray(rx_all), jnp.asarray(ry_all))
    return out[:n]


#: alignment grain of the in-kernel crop origins (detect_cascade_fused_
#: frames): rows to the int8 sublane tile, cols to the 128-lane tile —
#: DMA slice starts stay tile-aligned for the uint8 window scratch.
FRAME_ROW_ALIGN = 32
FRAME_COL_ALIGN = 128


def _features_frames_kernel(idx_ref, oy_ref, ox_ref, x0_ref, frames_ref,
                            wx_ref, wy_ref, rx_ref, ry_ref, o_ref,
                            u8scr, winscr, gscr, pscr, pwide, bscr, cscr,
                            iedscr, dsems,
                            *, level, g_faces, ry_n, rx_n, num_landmarks,
                            o_count, dims, cell_size, r_idx, l_idx,
                            g_unroll=1):
    """_features_kernel with the per-face window crop fused IN (the
    training-extraction twin of _cascade_frames_kernel): each grid step
    DMAs its G faces' uint8 windows straight out of the HBM-resident
    frame stack — the per-sample XLA window gather that fed
    extract_features_fused (one (chunk, RY, RX) bf16 materialisation
    per level per chunk) disappears entirely."""
    _crop_windows_dma(idx_ref, oy_ref, ox_ref, frames_ref, u8scr, winscr,
                      dsems, g_faces)

    s, w, wx, rel = level
    c = hog_num_cells(s, cell_size)
    kdim = o_ref.shape[1]
    o_ref[:, kdim - SEG:kdim] = jnp.ones((g_faces, SEG), jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init_bscr():
        bscr[:, :] = jnp.zeros(bscr.shape, jnp.float32)

    _sample_level_batch(
        winscr, x0_ref, iedscr, wx_ref, wy_ref, gscr, pscr, pwide,
        bscr, li=0, s=s, w=w, wx=wx, ry_n=ry_n, rx_n=rx_n,
        num_landmarks=num_landmarks, o_count=o_count, g_faces=g_faces,
        rel_patch=rel, cell_size=cell_size, r_idx=r_idx, l_idx=l_idx,
        g_unroll=g_unroll)
    _hog_tail(bscr, cscr, o_ref, rx_ref, ry_ref, g_faces=g_faces,
              c=c, o_count=o_count, dims=dims)


@functools.partial(jax.jit, static_argnames=(
    "window_shape", "level", "cell_size", "num_orientations", "dims",
    "r_idx", "l_idx", "faces_per_step", "g_unroll", "interpret"))
def extract_features_fused_frames(frames: jnp.ndarray,
                                  image_indices: jnp.ndarray,
                                  oy: jnp.ndarray,
                                  ox: jnp.ndarray,
                                  x: jnp.ndarray,
                                  window_shape,
                                  level,
                                  cell_size: int,
                                  num_orientations: int,
                                  dims: int,
                                  r_idx,
                                  l_idx,
                                  faces_per_step: int = None,
                                  g_unroll: int = None,
                                  interpret: bool = False) -> jnp.ndarray:
    """extract_features_fused with the window crop fused into the
    kernel: the uint8 frame stack stays in HBM and each grid step DMAs
    its G samples' windows from per-sample (frame, row, col) origins —
    no per-sample (N, RY, RX) window gather/materialisation ahead of the
    kernel (the dominant extraction cost at 300-W training scale), so
    the caller needs no feature_chunk_size memory chunking either.

    frames: (n_img, H, W) uint8, W a multiple of FRAME_COL_ALIGN.
    image_indices/oy/ox: (N,) int32 per-sample frame + window origins;
      oy a multiple of FRAME_ROW_ALIGN with oy + RY <= H, ox a multiple
      of FRAME_COL_ALIGN with ox + RX <= W (align desired origins DOWN
      and express x in the aligned window's coordinates — the caller
      owns this, see models/rcr_training.py).
    x: (N, 2L) f32 current landmark rows in (aligned-)WINDOW coords.
    window_shape: static (RY, RX) of the cropped window.
    Everything else as extract_features_fused; returns the same
    (N, (D*C*NSEG+1)*SEG) padded kernel-order feature rows."""
    interpret = interpret or jax.default_backend() == "cpu"
    ry_n, rx_n = window_shape
    n = x.shape[0]
    l2 = x.shape[1]
    l = l2 // 2
    if faces_per_step is None:
        faces_per_step = default_faces_per_step(l)
    if g_unroll is None:
        g_unroll = default_g_unroll(l)
    g = min(faces_per_step, n)
    assert frames.dtype == jnp.uint8, "frames path requires uint8 frames"
    n_pad = -(-n // g) * g
    if n_pad != n:
        pad = n_pad - n
        image_indices = jnp.concatenate(
            [image_indices, jnp.tile(image_indices[:1], (pad,))])
        oy = jnp.concatenate([oy, jnp.tile(oy[:1], (pad,))])
        ox = jnp.concatenate([ox, jnp.tile(ox[:1], (pad,))])
        x = jnp.concatenate([x, jnp.tile(x[:1], (pad, 1))])

    s = level[0]
    lp = l * s
    c = hog_num_cells(s, cell_size)
    br = _block_rows(c)
    _, nseg = seg_packing(l, c)
    kdim = (dims * c * nseg + 1) * SEG
    wx_all, wy_all, rx_all, ry_all = _splat_consts(
        (tuple(level),), (cell_size,), num_orientations, l, g)
    kernel = functools.partial(
        _features_frames_kernel, level=tuple(level), g_faces=g,
        ry_n=ry_n, rx_n=rx_n, num_landmarks=l, o_count=num_orientations,
        dims=dims, cell_size=cell_size, r_idx=tuple(r_idx),
        l_idx=tuple(l_idx), g_unroll=g_unroll)

    const_spec = lambda shape: pl.BlockSpec(        # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    steps = n_pad // g
    image_indices = image_indices.astype(jnp.int32).reshape(steps, g)
    oy = oy.astype(jnp.int32).reshape(steps, g)
    ox = ox.astype(jnp.int32).reshape(steps, g)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[smem_spec, smem_spec, smem_spec,
                  pl.BlockSpec((g, 1, l2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  const_spec(wx_all.shape),
                  const_spec(wy_all.shape),
                  const_spec(rx_all.shape),
                  const_spec(ry_all.shape),
                  ],
        out_specs=pl.BlockSpec((g, kdim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, kdim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g, ry_n, rx_n), jnp.uint8),
            pltpu.VMEM((g, ry_n, rx_n), jnp.bfloat16),
            pltpu.VMEM((2 * num_orientations * s, lp), jnp.bfloat16),
            pltpu.VMEM((s, lp), jnp.float32),
            pltpu.VMEM((l, s, SEG) if l > LM_STATIC_MAX
                       else (1, 1, SEG), jnp.float32),
            pltpu.VMEM((2 * num_orientations * g * br, nseg * SEG),
                       jnp.float32),
            pltpu.VMEM((g * br, dims * nseg * SEG), jnp.float32),
            pltpu.VMEM((g, 1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((g,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(image_indices, oy, ox, x.astype(jnp.float32)[:, None, :], frames,
      jnp.asarray(wx_all), jnp.asarray(wy_all),
      jnp.asarray(rx_all), jnp.asarray(ry_all))
    return out[:n]


@functools.partial(jax.jit, static_argnames=(
    "window_shape", "levels", "cell_sizes", "num_orientations", "dims",
    "r_idx", "l_idx", "faces_per_step", "g_unroll", "quantize",
    "interpret", "probe"))
def detect_cascade_fused_frames(frames: jnp.ndarray,
                                image_indices: jnp.ndarray,
                                oy: jnp.ndarray,
                                ox: jnp.ndarray,
                                x0: jnp.ndarray,
                                weights_perm,
                                window_shape,
                                levels,
                                cell_sizes,
                                num_orientations: int,
                                dims: int,
                                r_idx,
                                l_idx,
                                faces_per_step: int = None,
                                g_unroll: int = None,
                                quantize: bool = True,
                                interpret: bool = False,
                                probe=None) -> jnp.ndarray:
    """detect_cascade_fused with the per-face window crop fused into the
    kernel: the uint8 frame stack stays in HBM and each grid step DMAs
    its G windows directly from per-face (frame, row, col) origins —
    no XLA crop prologue, no bf16 window round-trip through HBM
    (PERF_NOTES: the prologue was the largest non-kernel cost left,
    ~18 ms/batch-4096).

    frames: (n_img, H, W) uint8, W a multiple of FRAME_COL_ALIGN.
    image_indices/oy/ox: (N,) int32 per-face origins; oy must be a
      multiple of FRAME_ROW_ALIGN with oy + RY <= H, ox a multiple of
      FRAME_COL_ALIGN with ox + RX <= W (align desired origins DOWN and
      compensate in x0 — the caller owns this, see make_fused_detector).
    window_shape: static (RY, RX) of the cropped window; RX typically
      roi + FRAME_COL_ALIGN so the down-aligned ox still covers the
      face (an extra 128 uint8 columns cost less than half the bf16
      bytes the fused path no longer streams).
    x0: (N, 2L) f32 initial rows in WINDOW (origin-shifted) coordinates.
    Everything else as detect_cascade_fused. Returns (N, 2L) f32 rows
    in window coordinates.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    ry_n, rx_n = window_shape
    n = x0.shape[0]
    l2 = x0.shape[1]
    l = l2 // 2
    if faces_per_step is None:
        faces_per_step = default_faces_per_step(l)
    if g_unroll is None:
        g_unroll = default_g_unroll(l)
    g = min(faces_per_step, n)
    assert frames.dtype == jnp.uint8, "frames path requires uint8 frames"
    n_pad = -(-n // g) * g
    if n_pad != n:
        pad = n_pad - n
        image_indices = jnp.concatenate(
            [image_indices, jnp.tile(image_indices[:1], (pad,))])
        oy = jnp.concatenate([oy, jnp.tile(oy[:1], (pad,))])
        ox = jnp.concatenate([ox, jnp.tile(ox[:1], (pad,))])
        x0 = jnp.concatenate([x0, jnp.tile(x0[:1], (pad, 1))])

    s_max = max(lv[0] for lv in levels)
    lp_max = l * s_max
    c = hog_num_cells(levels[0][0], cell_sizes[0])
    br = _block_rows(c)
    _, nseg = seg_packing(l, c)
    kdim = (dims * c * nseg + 1) * SEG
    kernel = functools.partial(
        _cascade_frames_kernel, levels=tuple(levels), g_faces=g,
        ry_n=ry_n, rx_n=rx_n, num_landmarks=l, o_count=num_orientations,
        dims=dims, cell_sizes=tuple(cell_sizes), r_idx=tuple(r_idx),
        l_idx=tuple(l_idx), g_unroll=g_unroll, quantize=quantize,
        probe=probe)

    wx_all, wy_all, rx_all, ry_all = _splat_consts(
        tuple(levels), tuple(cell_sizes), num_orientations, l, g)
    w_ops = [jnp.asarray(w, jnp.bfloat16) for w in weights_perm]
    w_ops += [jnp.zeros((l2, kdim), jnp.bfloat16)] * (4 - len(w_ops))

    const_spec = lambda shape: pl.BlockSpec(        # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    # scalars ride SMEM UNBLOCKED as full (steps, G) arrays (Mosaic's
    # block-shape divisibility rules preclude (1, G) blocks); the kernel
    # rows-indexes by program_id. 4 B * 3 * steps * G = ~48 KB at the
    # bench batch — far under the scalar-memory budget.
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    steps = n_pad // g
    image_indices = image_indices.astype(jnp.int32).reshape(steps, g)
    oy = oy.astype(jnp.int32).reshape(steps, g)
    ox = ox.astype(jnp.int32).reshape(steps, g)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // g,),
        in_specs=[smem_spec, smem_spec, smem_spec,
                  pl.BlockSpec((g, 1, l2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  ] + [const_spec((l2, kdim))] * 4 + [
                  const_spec(wx_all.shape),
                  const_spec(wy_all.shape),
                  const_spec(rx_all.shape),
                  const_spec(ry_all.shape),
        ],
        out_specs=pl.BlockSpec((g, 1, l2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1, l2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g, ry_n, rx_n), jnp.uint8),
            pltpu.VMEM((g, ry_n, rx_n), jnp.bfloat16),
            pltpu.VMEM((2 * num_orientations * s_max, lp_max),
                       jnp.bfloat16),
            pltpu.VMEM((s_max, lp_max), jnp.float32),
            pltpu.VMEM((l, s_max, SEG) if l > LM_STATIC_MAX
                       else (1, 1, SEG), jnp.float32),
            pltpu.VMEM((g, kdim), jnp.float32),
            pltpu.VMEM((2 * num_orientations * g * br, nseg * SEG),
                       jnp.float32),
            pltpu.VMEM((g * br, dims * nseg * SEG), jnp.float32),
            pltpu.VMEM((g, 1, l2), jnp.float32),
            pltpu.VMEM((g, 1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((g,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(image_indices, oy, ox, x0.astype(jnp.float32)[:, None, :], frames,
      *w_ops, jnp.asarray(wx_all), jnp.asarray(wy_all),
      jnp.asarray(rx_all), jnp.asarray(ry_all))
    return out[:n, 0, :]


def compact_feature_columns(feats_k: jnp.ndarray, num_landmarks: int,
                            num_cells: int, dims: int) -> jnp.ndarray:
    """(N, (D*C*NSEG+1)*SEG) padded kernel rows -> (N, F) compact features.

    Column order stays the KERNEL order (block-major: (cx, d) outer,
    (lm, cy) inner — segments concatenate in landmark order, so the
    multi-segment packing changes nothing logically), bias LAST — a pure
    static slice+concat, no gather. The regularise_last_row bias
    exemption applies unchanged (bias is still the final column), and
    MatrixNorm's ||AtA||_F is permutation-invariant, so solves run
    directly on these features; map the solved weights back to reference
    order with compact_to_standard_rows.
    """
    l, c, d = num_landmarks, num_cells, dims
    lps, nseg = seg_packing(l, c)
    segs = []
    for i in range(d * c):
        for sg in range(nseg):
            n_lm = min(lps, l - sg * lps)
            base = (i * nseg + sg) * SEG
            segs.append(feats_k[:, base:base + n_lm * c])
    bias_lane = d * c * nseg * SEG
    bias = feats_k[:, bias_lane:bias_lane + 1]
    return jnp.concatenate(segs + [bias], axis=1)


@functools.lru_cache(maxsize=None)
def compact_to_standard_rows(num_landmarks: int, num_cells: int,
                             dims: int) -> np.ndarray:
    """(F,) map: std_rows[k] = reference-order row of compact column k.

    Use as W_std[std_rows] = W_compact to convert weights solved on
    compact_feature_columns output into the reference's Matlab order
    (adaptive_vlhog.hpp:166-183). The enumeration must match
    permute_weights' cx-major segment order."""
    l, c, d = num_landmarks, num_cells, dims
    cx, dd, lm, cy = np.meshgrid(np.arange(c), np.arange(d),
                                 np.arange(l), np.arange(c), indexing="ij")
    std = (lm * (d * c * c) + dd * c * c + cx * c + cy).ravel()
    return np.concatenate([std, [l * d * c * c]]).astype(np.int64)


@functools.partial(jax.jit, static_argnames=(
    "levels", "cell_sizes", "num_orientations", "dims", "r_idx", "l_idx",
    "faces_per_step", "g_unroll", "quantize", "interpret", "probe"))
def detect_cascade_fused(windows: jnp.ndarray,
                         x0: jnp.ndarray,
                         weights_perm,
                         levels,
                         cell_sizes,
                         num_orientations: int,
                         dims: int,
                         r_idx,
                         l_idx,
                         faces_per_step: int = None,
                         g_unroll: int = None,
                         quantize: bool = True,
                         interpret: bool = False,
                         probe=None) -> jnp.ndarray:
    """Run the full cascade over per-face windows in one kernel.

    windows: (N, RY, RX) bf16 (uint8/f32 cast here) face windows.
    x0: (N, 2L) f32 initial landmark rows in WINDOW coordinates.
    weights_perm: tuple of per-level (2L, (D*C*NSEG+1)*SEG) arrays
      (permute_weights output), cast to bf16 here.
    levels: tuple of (S, W, WX, relative_patch_size) per level; W/WX are
      the sampler sub-window sides (WX == RX means full width).
    r_idx/l_idx: eye-landmark index tuples for the IED.
    faces_per_step: G faces per grid step — batches each level's
      regressor GEMV to M=G (an M=1 GEMV wastes ~99% of its MXU tile).
    probe: stage-ablation measurement hook ('sample' = sampling loop
      only, 'nogemv' = sampling + HOG without the GEMV/update; output
      is garbage) — scripts/probe_fused.py.
    Returns (N, 2L) f32 final rows (window coordinates).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    n, ry_n, rx_n = windows.shape
    l2 = x0.shape[1]
    l = l2 // 2
    if faces_per_step is None:
        faces_per_step = default_faces_per_step(l)
    if g_unroll is None:
        g_unroll = default_g_unroll(l)
    g = min(faces_per_step, n)
    if windows.dtype != jnp.bfloat16:
        windows = windows.astype(jnp.bfloat16)
    n_pad = -(-n // g) * g
    if n_pad != n:
        windows = jnp.concatenate(
            [windows, jnp.tile(windows[:1], (n_pad - n, 1, 1))])
        x0 = jnp.concatenate([x0, jnp.tile(x0[:1], (n_pad - n, 1))])

    s_max = max(lv[0] for lv in levels)
    lp_max = l * s_max
    c = hog_num_cells(levels[0][0], cell_sizes[0])
    br = _block_rows(c)
    _, nseg = seg_packing(l, c)
    kdim = (dims * c * nseg + 1) * SEG
    kernel = functools.partial(
        _cascade_kernel, levels=tuple(levels), g_faces=g, ry_n=ry_n,
        rx_n=rx_n, num_landmarks=l, o_count=num_orientations, dims=dims,
        cell_sizes=tuple(cell_sizes), r_idx=tuple(r_idx),
        l_idx=tuple(l_idx), g_unroll=g_unroll, quantize=quantize,
        probe=probe)

    wx_all, wy_all, rx_all, ry_all = _splat_consts(
        tuple(levels), tuple(cell_sizes), num_orientations, l, g)
    w_ops = [jnp.asarray(w, jnp.bfloat16) for w in weights_perm]
    w_ops += [jnp.zeros((l2, kdim), jnp.bfloat16)] * (4 - len(w_ops))

    const_spec = lambda shape: pl.BlockSpec(        # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // g,),
        in_specs=[
            # singleton middle axis: the last two block dims must be
            # full-array or (8, 128)-divisible on TPU
            pl.BlockSpec((g, 1, l2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, ry_n, rx_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [const_spec((l2, kdim))] * 4 + [
            const_spec(wx_all.shape),
            const_spec(wy_all.shape),
            const_spec(rx_all.shape),
            const_spec(ry_all.shape),
        ],
        out_specs=pl.BlockSpec((g, 1, l2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1, l2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * num_orientations * s_max, lp_max),
                       jnp.bfloat16),
            pltpu.VMEM((s_max, lp_max), jnp.float32),
            pltpu.VMEM((l, s_max, SEG) if l > LM_STATIC_MAX
                       else (1, 1, SEG), jnp.float32),
            pltpu.VMEM((g, kdim), jnp.float32),
            pltpu.VMEM((2 * num_orientations * g * br, nseg * SEG),
                       jnp.float32),
            pltpu.VMEM((g * br, dims * nseg * SEG), jnp.float32),
            pltpu.VMEM((g, 1, l2), jnp.float32),
            pltpu.VMEM((g, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x0.astype(jnp.float32)[:, None, :], windows, *w_ops,
      jnp.asarray(wx_all), jnp.asarray(wy_all),
      jnp.asarray(rx_all), jnp.asarray(ry_all))
    return out[:n, 0, :]
