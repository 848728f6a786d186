"""Roofline / MFU accounting for the serving kernels (VERDICT r1 item 5).

For each cascade level's window sampler and flat HOG kernel at the
headline config (batch 1024, roi 512, max_ied 145 — the
scripts/profile_detect.py setup), computes analytic FLOPs and minimum HBM
bytes, measures fenced wall time, and reports achieved TFLOP/s and GB/s
against TPU v5e public peaks:

  * 197 TFLOP/s bf16 (MXU), 819 GB/s HBM per chip
    (cloud.google.com/tpu/docs/v5e — public spec sheet).

The point: decide headroom item #1 in docs/PERF_NOTES.md (whole-cascade
mega-kernel streaming each face window ONCE instead of once per level)
with numbers — if the sampler sits at the HBM roofline and window DMA is
a large share, the mega-kernel's saved re-streams bound its win.

Run on the real TPU: python scripts/roofline.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_BF16 = 197e12     # FLOP/s, v5e public spec
PEAK_HBM = 819e9       # B/s


def main():
    import jax
    import jax.numpy as jnp

    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.models import DetectionModel
    from superviseddescent_tpu.models.rcr import level_sub_windows
    from superviseddescent_tpu.ops.hog import hog_dimension, hog_num_cells
    from superviseddescent_tpu.ops.hog_pallas_flat import (
        hog_descriptor_pallas_flat)
    from superviseddescent_tpu.ops.patches_pallas import (
        max_patch_half, max_patch_half_x, sample_patches_window)
    from superviseddescent_tpu.utils.timing import measure

    model = DetectionModel.load(os.path.join(REPO, "pretrained",
                                             "rcr22_lfpw5.bin"))
    batch, roi = 1024, 512
    l = len(model.landmark_ids)
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.integers(0, 256, (batch, roi, roi)), jnp.bfloat16)
    cx = jnp.asarray(rng.uniform(200, 312, (batch, l)), jnp.float32)
    cy = jnp.asarray(rng.uniform(200, 312, (batch, l)), jnp.float32)
    mi = 145.0
    sub_w, sub_wx = level_sub_windows(model.hog_params, roi, mi)
    print(f"batch={batch} roi={roi} max_ied={mi} | v5e peaks: "
          f"{PEAK_BF16/1e12:.0f} TFLOP/s bf16, {PEAK_HBM/1e9:.0f} GB/s",
          flush=True)

    tot_dma = 0.0
    for li, p in enumerate(model.hog_params):
        w, wx = sub_w[li], sub_wx[li]
        wx_eff = wx or roi
        s = p.patch_size
        phw = jnp.full((batch,), min(
            round(p.relative_patch_size * 100 / 2), max_patch_half(w),
            max_patch_half_x(wx) if wx else 1e9), jnp.float32)

        # ---- sampler ---- #
        def samp():
            return sample_patches_window(
                windows, cx, cy, phw, s, sub_window=w, sub_window_x=wx,
                sampling="fast", transposed=True, out_dtype=jnp.bfloat16)
        t_s, _ = measure(samp, reps=20)
        # FLOPs: per landmark, transposed order: tx(S,WX)·sub(W,WX)^T then
        # q(S,W)·ty(S,W)^T
        flops_s = batch * l * 2 * (s * wx_eff * w + s * s * w)
        # minimum HBM traffic: each face's (roi, roi) bf16 window streams
        # once per level; patch outputs (l, s, s) bf16 write back
        dma_in = batch * roi * roi * 2
        dma_out = batch * l * s * s * 2
        bytes_s = dma_in + dma_out
        tot_dma += dma_in
        print(f"L{li} sampler S={s} W={w} WX={wx_eff}: {t_s*1e3:6.2f} ms | "
              f"{flops_s/t_s/1e12:5.1f} TFLOP/s ({flops_s/t_s/PEAK_BF16*100:4.1f}% MXU) | "
              f"{bytes_s/t_s/1e9:6.1f} GB/s ({bytes_s/t_s/PEAK_HBM*100:4.1f}% HBM)",
              flush=True)

        # ---- flat HOG ---- #
        patches = samp()
        flat = patches.reshape(batch * l, s * s)

        def hogk():
            return hog_descriptor_pallas_flat(
                flat, s, p.cell_size, p.num_bins, p.variant, fast=True,
                transposed=True)
        t_h, _ = measure(hogk, reps=20)
        c = hog_num_cells(s, p.cell_size)
        d = hog_dimension(p.variant, p.num_bins)
        # dominant FLOPs: the (2O, S*S) masked-gradient x (S*S, C*C) splat
        # dot per patch + small extract dot; elementwise ops are VPU-bound
        # and excluded (MFU here is MXU-only, so this understates load)
        flops_h = batch * l * 2 * (2 * p.num_bins) * s * s * c * c
        bytes_h = batch * l * (s * s * 2 + c * c * d * 4)
        print(f"L{li} flat HOG  C={c} D={d}:       {t_h*1e3:6.2f} ms | "
              f"{flops_h/t_h/1e12:5.1f} TFLOP/s ({flops_h/t_h/PEAK_BF16*100:4.1f}% MXU) | "
              f"{bytes_h/t_h/1e9:6.1f} GB/s ({bytes_h/t_h/PEAK_HBM*100:4.1f}% HBM)",
              flush=True)

    print(f"\nwindow re-stream traffic across 4 levels: "
          f"{tot_dma/1e9:.2f} GB per batch; a mega-kernel streaming each "
          f"window once would save {(tot_dma - tot_dma/4)/1e9:.2f} GB "
          f"(= {(tot_dma - tot_dma/4)/PEAK_HBM*1e3:.1f} ms at HBM peak)",
          flush=True)


if __name__ == "__main__":
    main()
