"""Probe: device->host readback cost vs payload size over the axon
tunnel, and the exact phase split of HaarCascadeDetector.detect's
remaining wall time (VERDICT r4 item 6: finish the Haar latency story).

detect() wall = net device compute + ONE packed readback + host decode
+ grouping. Net is ~10.6 ms and the fence RTT ~25 ms; wall measures
~41 ms — this probe pins where the unexplained ~5 ms lives (readback
payload size? host decode? grouping? dispatch overhead?).

Usage: python scripts/probe_readback.py
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

XML = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt2.xml"
DATA = "/root/reference/examples/data/ibug_lfpw_trainset"


def med(f, reps=30):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    ts = np.sort(ts)
    return ts[len(ts) // 2], ts[int(len(ts) * 0.9)]


def main():
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    # 1) raw readback cost vs payload size (same program, varying out)
    for n in (1, 256, 1024, 4096, 65536, 1 << 20):
        f = jax.jit(lambda x: (x * 2).astype(jnp.int32))
        buf = jnp.zeros((n,), jnp.int32)
        np.asarray(f(buf))
        m, p90 = med(lambda: np.asarray(f(buf)))
        print(f"readback {4*n/1024:9.1f} KB: median {m*1e3:6.2f} ms "
              f"(p90 {p90*1e3:6.2f})", flush=True)

    # 2) detect() phase split
    from superviseddescent_tpu.models import facedetect as fd
    from superviseddescent_tpu.ops.patches import load_gray_image, \
        stack_images

    det = fd.HaarCascadeDetector(XML, scale_factor=1.2, min_neighbors=2,
                                 min_size=(50, 50))
    stack, _ = stack_images(
        [load_gray_image(os.path.join(DATA, "image_0001.png"))],
        pad_width_to=128)
    img_dev = jax.device_put(jnp.asarray(np.asarray(stack[0], np.float32)))
    h, w = img_dev.shape
    det.detect(img_dev)                       # warm

    d = det.data
    plan = det._pyramid_plan(1, h, w)
    args = (det._bank0, det._bank1, det._thresh0, det._thresh1,
            det._flip0, det._leaves, det._stage_thresholds, det._norm_mask)
    total = sum(s[5] * s[6] for s in plan)
    concat = total <= det.CONCAT_MAX and all(s[7] == 1 for s in plan)
    statics = (plan, d.window_height, d.window_width, det._stage_bounds,
               det._precision, concat)

    m, p90 = med(lambda: fd._run_pyramid_packed(
        img_dev, *args, *statics, det.SURVIVOR_DIV, det.MAX_CANDIDATES))
    print(f"dispatch only:        median {m*1e3:6.2f} ms (p90 {p90*1e3:6.2f})",
          flush=True)
    m, p90 = med(lambda: np.asarray(fd._run_pyramid_packed(
        img_dev, *args, *statics, det.SURVIVOR_DIV, det.MAX_CANDIDATES)))
    print(f"dispatch + readback:  median {m*1e3:6.2f} ms (p90 {p90*1e3:6.2f})",
          flush=True)

    packed = np.asarray(fd._run_pyramid_packed(
        img_dev, *args, *statics, det.SURVIVOR_DIV, det.MAX_CANDIDATES))

    def host_only():
        offsets, p_band, p_w, p_stride, p_factor = \
            det._plan_decode_meta(plan)
        count = int(packed[0, -2])
        sel = packed[0, :count].astype(np.int64)
        pid = np.searchsorted(offsets, sel, side="right") - 1
        local = sel - offsets[pid]
        ys = p_band[pid] + local // p_w[pid]
        xs = local % p_w[pid]
        sf = p_stride[pid] * p_factor[pid]
        raw = np.stack([np.round(xs * sf), np.round(ys * sf),
                        np.round(d.window_width * p_factor[pid]),
                        np.round(d.window_height * p_factor[pid])],
                       axis=1).astype(np.float32)
        return fd.group_rectangles(raw, det.min_neighbors)

    m, p90 = med(host_only)
    print(f"host decode+grouping: median {m*1e3:6.2f} ms (p90 {p90*1e3:6.2f})",
          flush=True)

    m, p90 = med(lambda: det.detect(img_dev))
    print(f"full detect():        median {m*1e3:6.2f} ms (p90 {p90*1e3:6.2f})",
          flush=True)


if __name__ == "__main__":
    main()
