"""App smoke tests: the three CLIs end-to-end on the bundled data (CPU).

Marked slow-ish (~2-4 min total): a 2-level training run plus detect/track.
"""

import os
import subprocess
import sys

import pytest

DATA = "/root/reference/examples/data/ibug_lfpw_trainset"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")

ENV = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")


def run(args, timeout=600):
    return subprocess.run([sys.executable, "-m"] + args, env=ENV,
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    out = tmp_path_factory.mktemp("apps") / "model.bin"
    r = run(["superviseddescent_tpu.apps.rcr_train",
             "-d", DATA, "-t", DATA, "-o", str(out),
             "--levels", "2", "--num-perturbations", "2", "--seed", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Normalised LM-error test:" in r.stdout
    assert os.path.exists(out)
    assert os.path.exists(str(out).replace(".bin", ".error.txt"))
    return out


def test_rcr_train_mirror(tmp_path):
    # --mirror doubles the set with flipped faces; the callback ground
    # truth must follow (train error is printed against the doubled set)
    out = tmp_path / "mirror.bin"
    r = run(["superviseddescent_tpu.apps.rcr_train",
             "-d", DATA, "-o", str(out),
             "--levels", "1", "--num-perturbations", "1", "--seed", "1",
             "--mirror"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Normalised LM-error train:" in r.stdout
    assert os.path.exists(out)


def test_rcr_train_output(trained_model):
    # training prints per-level residuals and saves a loadable model
    from superviseddescent_tpu.models import DetectionModel
    model = DetectionModel.load(trained_model)
    assert len(model.sdo.regressors) == 2
    assert len(model.landmark_ids) == 22


def test_rcr_detect(trained_model, tmp_path):
    out_png = tmp_path / "det.png"
    r = run(["superviseddescent_tpu.apps.rcr_detect",
             "-m", str(trained_model),
             "-i", os.path.join(DATA, "image_0001.png"),
             "--pts", os.path.join(DATA, "image_0001.pts"),
             "-o", str(out_png)])
    assert r.returncode == 0, r.stderr[-2000:]
    # prints one "<name>: x y" line per landmark
    lines = [l for l in r.stdout.splitlines() if ": " in l]
    assert len(lines) >= 22
    assert out_png.exists()


def test_rcr_detect_requires_box(trained_model):
    r = run(["superviseddescent_tpu.apps.rcr_detect",
             "-m", str(trained_model),
             "-i", os.path.join(DATA, "image_0001.png")])
    assert r.returncode == 1
    assert "facebox" in r.stdout


def test_rcr_track(trained_model):
    r = run(["superviseddescent_tpu.apps.rcr_track",
             "-m", str(trained_model), "-f", DATA,
             "--facebox", "93,165,256,256"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.count("frame ") == 5
    assert "fit" in r.stdout


def test_rcr_track_pipelined_fused(trained_model, tmp_path):
    # the fused tracking pipeline with async-window readback (round 5,
    # default --depth 8; docs/PERF_NOTES.md "Tracked frames/s"): 11
    # synthetic drift frames large enough for the fused roi window,
    # collected at a 3-frame lag (exercises the window, the end drain,
    # and any in-flight loss refit)
    import numpy as np
    from PIL import Image
    from superviseddescent_tpu.io import read_pts_landmarks
    from superviseddescent_tpu.models import gt_facebox
    from superviseddescent_tpu.ops.patches import load_gray_image

    png = os.path.join(DATA, "image_0001.png")
    lms = read_pts_landmarks(os.path.join(DATA, "image_0001.pts"))
    base = np.asarray(load_gray_image(png), np.float32)
    h, w = base.shape
    padded = np.zeros((max(h, 544), max(((w + 127) // 128) * 128, 512)),
                      np.float32)
    padded[:h, :w] = base
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for t in range(11):
        dx = int(round(2.0 * np.sin(2 * np.pi * t / 25.0)))
        Image.fromarray(np.roll(padded, dx, axis=1).astype(np.uint8)).save(
            frames_dir / f"f{t:02d}.png")
    box = gt_facebox(lms)
    r = run(["superviseddescent_tpu.apps.rcr_track",
             "-m", str(trained_model), "-f", str(frames_dir),
             "--facebox", ",".join(f"{v:.1f}" for v in box),
             "--depth", "3"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    # every frame reported exactly once, in order
    reported = [int(l.split()[1]) for l in r.stdout.splitlines()
                if l.startswith("frame ") and "(" in l and "lost" not in l]
    assert reported == list(range(11)), r.stdout
    assert "using the fused whole-cascade kernel" in r.stdout
    assert "(lag 3)" in r.stdout

    # offline whole-clip mode (--scan): one lax.scan program; the
    # pre-loss bbox chain must match the pipelined run's frame-for-frame
    r2 = run(["superviseddescent_tpu.apps.rcr_track",
              "-m", str(trained_model), "-f", str(frames_dir),
              "--facebox", ",".join(f"{v:.1f}" for v in box),
              "--scan"], timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "scan: 11 frames" in r2.stdout

    def bboxes(out):
        return [l.split("bbox ")[1] for l in out.splitlines()
                if l.startswith("frame ") and "bbox" in l]

    b_pipe, b_scan = bboxes(r.stdout), bboxes(r2.stdout)
    n_common = next((j for j, (a, b) in enumerate(zip(b_pipe, b_scan))
                     if a != b), len(b_scan))
    # identical until the first pipelined-run loss re-init (if any)
    assert n_common >= min(4, len(b_scan)), (b_pipe, b_scan)


XML = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt2.xml"


@pytest.mark.skipif(not os.path.exists(XML), reason="stock cascade absent")
def test_rcr_train_cascade_facebox_source(tmp_path):
    # the reference training pipeline's face-detection stage
    # (rcr-train.cpp:383-436): Haar detection via detect_batch (one
    # readback per image-size class) + check_face true-positive filter
    out = tmp_path / "cascade_src.bin"
    r = run(["superviseddescent_tpu.apps.rcr_train",
             "-d", DATA, "-o", str(out),
             "--levels", "1", "--num-perturbations", "1", "--seed", "1",
             "--facebox-source", f"cascade:{XML}"], timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Normalised LM-error train:" in r.stdout
    assert os.path.exists(out)


@pytest.mark.skipif(not os.path.exists(XML), reason="stock cascade absent")
def test_rcr_detect_with_face_detector(trained_model):
    # the fully standalone pipeline: built-in Haar face detection feeds
    # the landmark cascade (reference rcr-detect.cpp:110 flow)
    r = run(["superviseddescent_tpu.apps.rcr_detect",
             "-m", str(trained_model),
             "-i", os.path.join(DATA, "image_0001.png"),
             "-f", XML])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if ": " in l]
    assert len(lines) >= 22
