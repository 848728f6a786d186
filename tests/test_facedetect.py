"""TPU-native Haar cascade face detection (models/facedetect.py).

Validates the MXU cascade evaluator against the stock OpenCV
haarcascade_frontalface_alt2.xml on the bundled LFPW images, using the
reference's own true-positive criterion (check_face: GT landmarks
37/46/58 inside the detected box, helpers.hpp:106-131). cv2 5.x dropped
CascadeClassifier so no direct OpenCV cross-check is possible in this
image; the parser/evaluator semantics are documented against
cascadedetect.cpp in io/haar.py.
"""

import glob
import os

import numpy as np
import pytest

XML = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt2.xml"
DATA = "/root/reference/examples/data/ibug_lfpw_trainset"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(XML) and os.path.isdir(DATA)),
    reason="stock cascade XML or reference data absent")


@pytest.fixture(scope="module")
def detector():
    from superviseddescent_tpu.models.facedetect import HaarCascadeDetector
    return HaarCascadeDetector(XML, scale_factor=1.2, min_neighbors=2,
                               min_size=(50, 50))


def test_parse_alt2():
    from superviseddescent_tpu.io.haar import parse_opencv_cascade
    d = parse_opencv_cascade(XML)
    assert (d.window_width, d.window_height) == (20, 20)
    assert d.num_stages == 20
    assert d.num_trees == d.bank0.shape[1] == d.bank1.shape[1]
    assert d.stage_bounds[0] == 0 and d.stage_bounds[-1] == d.num_trees
    # every node-0 feature must move some pixel mass
    assert (np.abs(d.bank0).sum(axis=0) > 0).all()


def test_detects_lfpw_faces(detector):
    """The true face is found in each bundled LFPW image (reference
    check_face criterion), with few false positives."""
    from superviseddescent_tpu.io import read_pts_landmarks
    from superviseddescent_tpu.ops.patches import load_gray_image
    from superviseddescent_tpu.utils.landmarks import check_face

    found, total_boxes, images = 0, 0, 0
    for png in sorted(glob.glob(os.path.join(DATA, "*.png"))):
        img = np.asarray(load_gray_image(png))
        gt = read_pts_landmarks(png.replace(".png", ".pts"))
        boxes = detector.detect(img)
        total_boxes += len(boxes)
        images += 1
        if any(check_face([b], gt) for b in boxes):
            found += 1
    assert images == 5
    assert found >= 4, f"only {found}/5 faces found"
    assert total_boxes <= 3 * images, f"too many detections: {total_boxes}"


def test_group_rectangles():
    from superviseddescent_tpu.models.facedetect import group_rectangles
    boxes = np.float32([[10, 10, 50, 50], [12, 11, 50, 50], [11, 12, 49, 51],
                        [200, 200, 40, 40]])
    out = group_rectangles(boxes, min_neighbors=2)
    # the 3-member cluster survives (its average), the singleton is dropped
    assert out.shape == (1, 4)
    np.testing.assert_allclose(out[0], boxes[:3].mean(axis=0))
    out0 = group_rectangles(boxes, min_neighbors=0)
    assert out0.shape[0] == 2


def test_synthetic_stump_cascade(tmp_path):
    """End-to-end parse + evaluate on a hand-built single-stump cascade:
    passes exactly where the window's center rect is brighter than the
    surround (feature value > threshold picks the 'face' leaf)."""
    xml = tmp_path / "toy.xml"
    xml.write_text("""<?xml version="1.0"?>
<opencv_storage>
<cascade type_id="opencv-cascade-classifier"><stageType>BOOST</stageType>
  <featureType>HAAR</featureType>
  <height>8</height><width>8</width>
  <stageParams><maxWeakCount>1</maxWeakCount></stageParams>
  <featureParams><maxCatCount>0</maxCatCount></featureParams>
  <stageNum>1</stageNum>
  <stages>
    <_>
      <maxWeakCount>1</maxWeakCount>
      <stageThreshold>0.5</stageThreshold>
      <weakClassifiers>
        <_>
          <internalNodes>0 -1 0 2.0</internalNodes>
          <leafValues>0. 1.</leafValues></_></weakClassifiers></_>
  </stages>
  <features>
    <_>
      <rects>
        <_>0 0 8 8 -1.</_>
        <_>2 2 4 4 4.</_></rects></_>
  </features>
</cascade>
</opencv_storage>
""")
    from superviseddescent_tpu.models.facedetect import HaarCascadeDetector
    det = HaarCascadeDetector(str(xml), min_neighbors=0, min_size=(8, 8))
    img = np.zeros((32, 32), np.float32)
    img[12:16, 12:16] = 255.0  # bright 4x4 blob at (12, 12)
    boxes = det.detect(img)
    assert len(boxes) >= 1
    # the strongest alignment is the window whose inner rect covers the blob
    assert any(b[0] == 10 and b[1] == 10 for b in boxes), boxes


def test_parse_all_stock_frontal_cascades():
    """Every stock frontal-face cascade parses; tilted-feature cascades
    raise a clean ValueError (tilted rects are out of scope — faces
    don't need them)."""
    import glob
    from superviseddescent_tpu.io.haar import parse_opencv_cascade
    ok, skipped = 0, 0
    for p in sorted(glob.glob("/usr/share/opencv4/haarcascades/*.xml")):
        try:
            d = parse_opencv_cascade(p)
            assert d.num_trees > 0 and d.num_stages > 0
            ok += 1
        except ValueError:
            skipped += 1
    assert ok >= 5, (ok, skipped)  # eye, catface, alt, alt2, alt_tree,
    #                                default, profileface parse here


def test_banded_evaluation_matches_unbanded(detector):
    """Row-band chunking (memory bound for large frames) produces the
    same detections as whole-image evaluation."""
    from superviseddescent_tpu.models.facedetect import HaarCascadeDetector
    from superviseddescent_tpu.ops.patches import load_gray_image
    img = np.asarray(load_gray_image(
        os.path.join(DATA, "image_0001.png")))
    ref = detector.detect(img)
    banded = HaarCascadeDetector(XML, scale_factor=1.2, min_neighbors=2,
                                 min_size=(50, 50))
    banded.MAX_WINDOWS_PER_CALL = 2048  # force many bands per scale
    out = banded.detect(img)
    np.testing.assert_allclose(out, ref)


def test_prefilter_matches_dense_and_overflow_fallback(detector):
    """The two-phase survivor prefilter is bit-identical to dense
    evaluation, and a too-small survivor buffer trips the pre_overflow
    flag into the dense-mask fallback with identical results."""
    from superviseddescent_tpu.models.facedetect import HaarCascadeDetector
    from superviseddescent_tpu.ops.patches import load_gray_image
    img = np.asarray(load_gray_image(os.path.join(DATA, "image_0002.png")))
    ref = detector.detect(img)          # default SURVIVOR_DIV=4

    dense = HaarCascadeDetector(XML, scale_factor=1.2, min_neighbors=2,
                                min_size=(50, 50))
    dense.SURVIVOR_DIV = 0              # prefilter disabled
    np.testing.assert_array_equal(dense.detect(img), ref)

    tiny = HaarCascadeDetector(XML, scale_factor=1.2, min_neighbors=2,
                               min_size=(50, 50))
    tiny.SURVIVOR_DIV = 1 << 20         # 128-slot buffer: must overflow
    np.testing.assert_array_equal(tiny.detect(img), ref)


def test_concat_eval_matches_per_scale(detector):
    """The concatenated-scale latency mode (one evaluation chain across
    all pyramid scales, used whenever total windows <= CONCAT_MAX) is
    bit-identical to per-scale evaluation. The default detector hits
    concat_eval=True on the LFPW frames; forcing CONCAT_MAX=0 compiles
    the per-scale chain (single band per scale) over the same plan."""
    from superviseddescent_tpu.models.facedetect import HaarCascadeDetector
    from superviseddescent_tpu.ops.patches import load_gray_image
    img = np.asarray(load_gray_image(os.path.join(DATA, "image_0003.png")))
    ref = detector.detect(img)          # concat path (~79k windows)
    per_scale = HaarCascadeDetector(XML, scale_factor=1.2, min_neighbors=2,
                                    min_size=(50, 50))
    per_scale.CONCAT_MAX = 0            # force per-scale chains
    np.testing.assert_array_equal(per_scale.detect(img), ref)


def test_detect_batch_matches_single(detector):
    """detect_batch (one pyramid enqueue + ONE readback for the whole
    stack) returns exactly what per-frame detect() returns."""
    from superviseddescent_tpu.ops.patches import load_gray_image
    img = np.asarray(load_gray_image(os.path.join(DATA, "image_0001.png")))
    h, w = img.shape
    # three same-shape frames with different content: the image, a
    # shifted crop re-padded to size, and a blank frame (no detections)
    shifted = np.zeros_like(img)
    shifted[:h - 40, :w - 30] = img[40:, 30:]
    frames = np.stack([img, shifted, np.zeros_like(img)])
    batched = detector.detect_batch(frames)
    assert len(batched) == 3
    for frame, got in zip(frames, batched):
        want = detector.detect(frame)
        np.testing.assert_array_equal(got, want)
    assert len(batched[0]) >= 1          # the true face is still found
    assert len(batched[2]) == 0          # blank frame stays empty


def test_boxes_match_goldens(detector):
    """Regression goldens (VERDICT r1 item 7): the detector's boxes on the
    LFPW images, pinned so stride/rounding/grouping drift is visible.
    Goldens were generated by this implementation on the CPU backend;
    re-generate deliberately only when detector semantics intentionally
    change. Regenerated round 4 for the integer-quantised pyramid
    (OpenCV uint8-pyramid semantics; enables the exact single-pass bf16
    MXU path — facedetect.py module docstring). Box COUNTS were
    unchanged by that regeneration; positions moved <= 7.9 px from
    cluster-membership changes. The integer-exact evaluation makes these
    goldens backend-invariant: CPU f32 and TPU bf16 compute the same
    exact integers."""
    from superviseddescent_tpu.ops.patches import load_gray_image
    goldens = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                   "haar_boxes.npz"))
    for png in sorted(glob.glob(os.path.join(DATA, "*.png"))):
        name = os.path.basename(png)
        boxes = np.asarray(detector.detect(
            np.asarray(load_gray_image(png))))
        want = goldens[name]
        assert boxes.shape == want.shape, (name, boxes, want)
        # tolerance: grouping averages f32 box coords; backend summation
        # differences move them by <0.1 px, a box-count/ordering change
        # would blow far past this
        np.testing.assert_allclose(boxes, want, atol=0.5, err_msg=name)


def test_detect_stream_matches_single(detector):
    """The pipelined async API (detect_begin/detect_end + detect_stream,
    the VERDICT r3 item-6 'return device results and let callers fence'
    path) returns exactly what synchronous detect() returns, in order,
    including mixed-shape frames (per-(H, W)-class programs) and a blank
    frame (empty result)."""
    from superviseddescent_tpu.ops.patches import load_gray_image
    img = np.asarray(load_gray_image(os.path.join(DATA, "image_0001.png")))
    h, w = img.shape
    shifted = np.zeros_like(img)
    shifted[:h - 40, :w - 30] = img[40:, 30:]
    frames = [img, shifted, np.zeros_like(img), img[: h - 64, : w - 32]]
    streamed = list(detector.detect_stream(frames))
    assert len(streamed) == len(frames)
    for frame, got in zip(frames, streamed):
        np.testing.assert_array_equal(got, detector.detect(frame))
    assert len(streamed[0]) >= 1
    assert len(streamed[2]) == 0
    # the async-window depth is output-invariant (round 5: depth-D
    # readback overlap; boxes must be identical for every D, including
    # D=1 (lag-one) and D > n_frames (pure drain))
    for depth in (1, 2, 7):
        got_d = list(detector.detect_stream(frames, depth=depth))
        for a, b in zip(streamed, got_d):
            np.testing.assert_array_equal(a, b)
    # explicit begin/end with two in flight, fenced out of issue order
    p0 = detector.detect_begin(img)
    p1 = detector.detect_begin(shifted)
    np.testing.assert_array_equal(detector.detect_end(p1),
                                  detector.detect(shifted))
    np.testing.assert_array_equal(detector.detect_end(p0),
                                  detector.detect(img))
