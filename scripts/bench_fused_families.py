"""Measure the fused whole-cascade kernel across model families.

The reference's model layer is size-generic (model.hpp:122-219): it ships
a 22-landmark and a 29-landmark (COFW) model, and the ibug annotation it
trains from has 68 points. Round 3 generalised the fused kernel's lane
packing past 128 lanes (ops/cascade_pallas.py::seg_packing), so this
script measures the headline serving path at COFW-29 and ibug-68 scale —
both at the flagship 4-level, 5-cell RCR configuration (cell sizes
11/10/8/6, rel patch 1.0/0.7/0.4/0.25; rcr-train.cpp:447).

Weights are random (throughput is weight-agnostic); correctness on
silicon is cross-checked against the same kernel in CPU interpret mode
(run in a clean CPU subprocess — the CPU test suite pins interpret mode
against the exact monolithic path).

Usage: python scripts/bench_fused_families.py [L] [G] [batch]
       (defaults: 29 8 4096; results -> docs/PERF_NOTES.md)
"""
import glob
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IDS29 = [str(i) for i in
         (3, 9, 15, 18, 20, 22, 23, 25, 27, 28, 31, 32, 34, 36,
          37, 38, 40, 41, 43, 44, 46, 47, 49, 51, 52, 53, 55, 58, 63)]


def family_ids(n_lm):
    return IDS29 if n_lm == 29 else [str(i) for i in range(1, 69)]


def load_family_data(n_lm):
    """LFPW 5-image stack + ground-truth rows + faceboxes for the
    n_lm-landmark family (the bundled .pts carry all 68 ibug points,
    landmarks_io.hpp:57-83, so every family's ground truth is real)."""
    from superviseddescent_tpu.io.pts import read_pts_landmarks
    from superviseddescent_tpu.models import gt_facebox
    from superviseddescent_tpu.ops.patches import (
        load_gray_image, stack_images)
    from superviseddescent_tpu.utils.landmarks import (
        to_landmark_collection, to_row)

    ids = family_ids(n_lm)
    assert len(ids) == n_lm, n_lm
    data = "/root/reference/examples/data/ibug_lfpw_trainset"
    images, rows = [], []
    for png in sorted(glob.glob(f"{data}/*.png")):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(ids)))
    gt_rows = np.stack(rows)
    boxes5 = np.stack([gt_facebox(to_landmark_collection(r, ids))
                       for r in gt_rows]).astype(np.float32)
    stack, _ = stack_images(images, pad_width_to=128)
    return ids, stack, gt_rows, boxes5


def get_trained_family_model(n_lm, train_if_missing=True):
    """The committed LFPW-5-trained family model (VERDICT r4 item 2: the
    reference's biggest shipped family must exist TRAINED and
    accuracy-scored, not as a random-weights throughput demo) —
    pretrained/rcr{n}_lfpw5.bin, trained once with the flagship 4-level
    config (rcr-train.cpp:439-447) and committed. Committing the .bin
    keeps the fused detector's closed-over weight constants byte-stable
    across runs, so the driver's families section hits the compile
    cache instead of recompiling per run."""
    from superviseddescent_tpu.io import load_mean, read_ied_definition
    from superviseddescent_tpu.models import (
        DetectionModel, RcrTrainConfig, train_rcr)
    from superviseddescent_tpu.utils.landmarks import (
        to_landmark_collection, to_row)

    path = os.path.join(REPO, "pretrained", f"rcr{n_lm}_lfpw5.bin")
    if os.path.exists(path):
        return DetectionModel.load(path)
    if not train_if_missing:
        raise FileNotFoundError(path)
    cfg_dir = "/root/reference/apps/rcr/data"
    ids, stack, gt_rows, boxes5 = load_family_data(n_lm)
    right_ids, left_ids = read_ied_definition(f"{cfg_dir}/rcr_eval.cfg")
    mean68 = load_mean(f"{cfg_dir}/mean_ibug_lfpw_68.txt")
    ibug = [str(i) for i in range(1, 69)]
    mean = to_row(to_landmark_collection(mean68, ibug).filter(ids))
    # cholesky: the default lu's blocked LuDecomposition custom call
    # blows the 16 MB scoped-vmem budget at F=11601+ (29-lm) panels;
    # the blocked Cholesky stays inside it at 27201 (68-lm)
    model = train_rcr(stack, gt_rows, boxes5, ids, right_ids, left_ids,
                      mean, RcrTrainConfig(seed=0,
                                           solver_method="cholesky"))
    model.save(path)
    return model


def build(n_lm):
    """Deterministic random-weight model + LFPW data for n_lm landmarks."""
    import jax.numpy as jnp

    from superviseddescent_tpu import (
        LinearRegressor, Regulariser, RegularisationType,
        SupervisedDescentOptimiser)
    from superviseddescent_tpu.models import DetectionModel
    from superviseddescent_tpu.models.rcr import (
        HogParams, InterEyeDistanceNormalisation)
    from superviseddescent_tpu.ops.hog import (
        HogVariant, hog_dimension, hog_num_cells)

    ids, stack, gt_rows, boxes5 = load_family_data(n_lm)
    # flagship 4-level config at 5 cells (rcr-train.cpp:447)
    hog_params = tuple(
        HogParams(HogVariant.Uoctti, 5, cs, 4, rp)
        for cs, rp in ((11, 1.0), (10, 0.7), (8, 0.4), (6, 0.25)))
    mean = np.mean([np.concatenate([(r[:n_lm] - b[0]) / b[2] - 0.5,
                                    (r[n_lm:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes5)],
                   axis=0).astype(np.float32)

    rng = np.random.default_rng(0)
    dims = hog_dimension(HogVariant.Uoctti, 4)
    regs = []
    for p in hog_params:
        c = hog_num_cells(p.patch_size, p.cell_size)
        f = n_lm * c * c * dims + 1
        regs.append(LinearRegressor(
            weights=jnp.asarray(
                rng.normal(0, 1e-3, (f, 2 * n_lm)).astype(np.float32)),
            regulariser=Regulariser(RegularisationType.MatrixNorm, 1.5,
                                    False)))
    norm = InterEyeDistanceNormalisation(ids, ["37", "40"], ["43", "46"])
    model = DetectionModel(SupervisedDescentOptimiser(regs, norm),
                           mean, ids, hog_params,
                           ["37", "40"], ["43", "46"])
    return model, stack, boxes5


def cpu_check(n_lm, g, path, trained=False):
    """Subprocess entry (clean CPU backend): run the small batch through
    the fused kernel in interpret mode, save the output."""
    if trained:
        model = get_trained_family_model(n_lm, train_if_missing=False)
        _, stack, _, boxes5 = load_family_data(n_lm)
    else:
        model, stack, boxes5 = build(n_lm)
    detect = model.make_fused_detector(roi=512, max_ied=145.0,
                                       faces_per_step=g)
    small = 2 * g
    sel = np.arange(small) % stack.shape[0]
    out = np.asarray(detect(np.asarray(stack, np.uint8)[sel], boxes5[sel]))
    np.save(path, out)


def measure_family(n_lm, g=None, batch=4096, verify=True, trained=False):
    """Measure the fused serving path for an n_lm-landmark model at the
    flagship 5-cell config; returns {"faces_per_sec": .., "iod_err": ..}.
    g=None uses the model-size default
    (ops/cascade_pallas.py::default_faces_per_step). verify=True
    cross-checks a small batch against CPU interpret mode in a clean
    subprocess. trained=True serves the committed LFPW-5-trained family
    model instead of random weights and scores its train-set IOD error —
    a same-run end-to-end correctness check on the kernel + weights
    (VERDICT r4 item 2; throughput itself is weight-agnostic).
    Importable (bench.py "families" section)."""
    import jax
    import jax.numpy as jnp

    from superviseddescent_tpu.models import normalised_landmark_errors
    from superviseddescent_tpu.ops.cascade_pallas import (
        default_faces_per_step, seg_packing)
    from superviseddescent_tpu.utils.landmarks import resolve_eye_indices
    from superviseddescent_tpu.utils.timing import measure

    g = g or default_faces_per_step(n_lm)
    lps, nseg = seg_packing(n_lm, 5)
    print(f"L={n_lm} C=5: {n_lm * 5} packed lanes -> {nseg} segment(s), "
          f"G={g}, batch={batch}, "
          f"{'trained' if trained else 'random'} weights", flush=True)

    if trained:
        model = get_trained_family_model(n_lm)
        ids, stack, gt_rows, boxes5 = load_family_data(n_lm)
    else:
        model, stack, boxes5 = build(n_lm)
        gt_rows = None
    detect = model.make_fused_detector(roi=512, max_ied=145.0,
                                       faces_per_step=g)
    if verify:
        small = 2 * g
        sel_s = np.arange(small) % stack.shape[0]
        imgs_s = np.asarray(stack, np.uint8)[sel_s]
        bxs_s = boxes5[sel_s]
        t0 = time.time()
        out_tpu = np.asarray(detect(imgs_s, bxs_s))
        print(f"compile+first (batch {small}): {time.time()-t0:.1f}s",
              flush=True)

        # CPU interpret reference in a clean subprocess
        ref_path = f"/tmp/fused_fam_{n_lm}_{g}.npy"
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-check",
             str(n_lm), str(g), ref_path]
            + (["--trained"] if trained else []), check=True, env=env)
        out_cpu = np.load(ref_path)
        d = np.abs(out_tpu - out_cpu)
        print(f"TPU vs CPU-interpret: max {d.max():.4f} px, "
              f"mean {d.mean():.4f} px", flush=True)
        assert d.max() < 0.5, "fused kernel diverged from interpret mode"

    # throughput at the serving batch (device-resident windows, like
    # bench.py: expand the unique images on device)
    sel = np.arange(batch) % stack.shape[0]
    stk = jnp.asarray(stack, jnp.uint8)
    imgs = jax.jit(lambda st, i: st[i])(stk, jnp.asarray(sel, jnp.int32))
    bxs = jnp.asarray(boxes5[sel])
    t0 = time.time()
    out_b = detect(imgs, bxs)
    out_b.block_until_ready()
    print(f"compile+first (batch {batch}): {time.time()-t0:.1f}s",
          flush=True)
    rec = {}
    if trained:
        r_idx, l_idx = resolve_eye_indices(model.landmark_ids,
                                           model.right_eye_ids,
                                           model.left_eye_ids)
        err = float(np.mean(np.asarray(normalised_landmark_errors(
            np.asarray(out_b), gt_rows[sel], r_idx, l_idx))))
        print(f"L={n_lm} trained model, train-set IOD error: {err:.4f}",
              flush=True)
        assert err < 0.1, \
            f"trained {n_lm}-lm model through the fused kernel is broken"
        rec["iod_err"] = round(err, 4)
    dt, rtt = measure(detect, imgs, bxs, reps=20)
    print(f"L={n_lm} ({nseg} seg) G={g}: {dt*1e3:8.2f} ms / {batch} faces "
          f"-> {batch/dt:.0f} faces/sec (rtt {rtt*1e3:.1f} ms)",
          flush=True)
    rec["faces_per_sec"] = round(batch / dt, 1)
    return rec


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--cpu-check":
        cpu_check(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                  trained="--trained" in sys.argv)
        return

    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    trained = "--trained" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--trained"]
    n_lm = int(argv[0]) if argv else 29
    g = int(argv[1]) if len(argv) > 1 else None
    batch = int(argv[2]) if len(argv) > 2 else 4096
    print(measure_family(n_lm, g, batch, trained=trained))


if __name__ == "__main__":
    main()
