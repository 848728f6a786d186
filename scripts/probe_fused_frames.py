"""Probe: the in-kernel window crop (detect_cascade_fused_frames) vs the
legacy XLA crop prologue, end to end through make_fused_detector.

The frames path DMAs each face's uint8 window straight out of the HBM
frame stack inside the kernel — no per-face gather, no bf16 window
round-trip (PERF_NOTES: the prologue was ~18 ms/batch-4096, the largest
non-kernel cost). Sweeps G to re-pick the default at the bench batch.
Results -> docs/PERF_NOTES.md.
"""
import glob
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from superviseddescent_tpu.io import read_landmarks_list_to_train
    from superviseddescent_tpu.io.pts import read_pts_landmarks
    from superviseddescent_tpu.models import DetectionModel, gt_facebox
    from superviseddescent_tpu.ops.patches import (
        load_gray_image, stack_images)
    from superviseddescent_tpu.utils.landmarks import (
        to_landmark_collection, to_row)
    from superviseddescent_tpu.utils.timing import measure

    data = "/root/reference/examples/data/ibug_lfpw_trainset"
    cfg = "/root/reference/apps/rcr/data"
    model = DetectionModel.load(os.path.join(REPO, "pretrained",
                                             "rcr22_lfpw5.bin"))
    model_landmarks = read_landmarks_list_to_train(
        f"{cfg}/rcr_training_22.cfg")
    images, rows = [], []
    for png in sorted(glob.glob(f"{data}/*.png")):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(model_landmarks)))
    boxes5 = np.stack([gt_facebox(to_landmark_collection(r, model_landmarks))
                       for r in np.stack(rows)]).astype(np.float32)
    stack, _ = stack_images(images, pad_width_to=128)

    batch, roi = 4096, 512
    # args: G or GxU (faces-per-step x g_unroll)
    def parse(a):
        if "x" in a:
            g, u = a.split("x")
            return int(g), int(u)
        return int(a), None
    g_list = [parse(a) for a in sys.argv[1:]] or [(12, None), (8, None)]
    sel = np.arange(batch) % stack.shape[0]
    boxes = jnp.asarray(boxes5[sel])
    stk_u8 = jnp.asarray(stack, jnp.uint8)
    sel_dev = jnp.asarray(sel, jnp.int32)
    imgs_u8 = jax.jit(lambda st, i: st[i])(stk_u8, sel_dev)

    # on-silicon correctness vs the legacy crop path, small batch only
    # (an f32 expanded stack at batch 4096 is ~10 GB and OOMs the chip
    # next to the u8 one)
    nv = 512
    imgs_f32 = jax.jit(lambda st, i: st[i].astype(jnp.float32))(
        stk_u8, sel_dev[:nv])

    ref_out = None
    for g, gu in g_list:
        detect = model.make_fused_detector(roi=roi, max_ied=145.0,
                                           faces_per_step=g, g_unroll=gu)
        t0 = time.time()
        out = detect(imgs_u8, boxes)
        out.block_until_ready()
        print(f"G={g}x{gu} frames: compile+first {time.time()-t0:.1f}s",
              flush=True)
        o = np.asarray(out)
        if ref_out is None:
            ref_out = o
            t0 = time.time()
            leg = np.asarray(detect(imgs_f32, boxes[:nv]))
            print(f"G={g} legacy@{nv}: compile+first {time.time()-t0:.1f}s;"
                  f" max |frames - legacy| = "
                  f"{np.abs(o[:nv] - leg).max():.4f} px", flush=True)
        else:
            print(f"G={g}x{gu}: max |delta| vs first: "
                  f"{np.abs(o - ref_out).max():.4f} px", flush=True)
        dt, rtt = measure(detect, imgs_u8, boxes, reps=20)
        print(f"G={g}x{gu} frames (u8):   {dt*1e3:7.2f} ms / {batch} "
              f"-> {batch/dt:.0f} faces/sec (rtt {rtt*1e3:.1f} ms)",
              flush=True)
        # indexed: 5 unique frames, zero expansion anywhere
        out_i = detect(stk_u8, boxes, sel_dev)
        assert np.array_equal(np.asarray(out_i), o), \
            "indexed frames path diverged"
        dt, rtt = measure(detect, stk_u8, boxes, sel_dev, reps=20)
        print(f"G={g} frames (idx):  {dt*1e3:7.2f} ms / {batch} "
              f"-> {batch/dt:.0f} faces/sec (rtt {rtt*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
