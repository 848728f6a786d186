"""IO layer tests: .pts parsing, mean shape, INFO configs, cereal codec."""

import os

import numpy as np
import pytest

from superviseddescent_tpu.io import (
    read_pts_landmarks, load_mean,
    read_landmarks_list_to_train, read_ied_definition,
    CerealDetectionModel, CerealRegressor, CerealHoGParam,
    save_detection_model, load_detection_model,
)
from superviseddescent_tpu.utils.landmarks import (
    to_row, to_landmark_collection, get_ied, check_face,
)

REF_DATA = "/root/reference/examples/data"
REF_CFG = "/root/reference/apps/rcr/data"


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_read_pts_landmarks():
    lms = read_pts_landmarks(
        os.path.join(REF_DATA, "ibug_lfpw_trainset", "image_0001.pts"))
    assert len(lms) == 68
    assert lms.names[0] == "1" and lms.names[-1] == "68"
    # spot check: file coordinates minus the Matlab->C shift of 1.0
    with open(os.path.join(REF_DATA, "ibug_lfpw_trainset",
                           "image_0001.pts")) as f:
        lines = f.readlines()
    x0, y0 = map(float, lines[3].split())
    np.testing.assert_allclose(lms.coordinates[0],
                               [np.float32(x0) - 1.0, np.float32(y0) - 1.0])


def test_write_pts_landmarks_round_trip(tmp_path):
    from superviseddescent_tpu.io import write_pts_landmarks
    from superviseddescent_tpu.utils.landmarks import LandmarkCollection
    rng = np.random.default_rng(3)
    coords = rng.uniform(0, 500, size=(68, 2)).astype(np.float32)
    lms = LandmarkCollection([str(i) for i in range(1, 69)], coords)
    path = str(tmp_path / "rt.pts")
    write_pts_landmarks(path, lms)
    back = read_pts_landmarks(path)
    assert back.names == lms.names
    np.testing.assert_allclose(back.coordinates, coords, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_load_mean():
    mean = load_mean(os.path.join(REF_DATA, "mean_ibug_lfpw_68.txt"))
    assert mean.shape == (136,)
    # mean is roughly in [-0.5, 0.5]^2 facebox space (chin dips below)
    assert np.all(mean >= -0.6) and np.all(mean <= 0.6)
    np.testing.assert_allclose(mean[0], -0.425447, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference cfg absent")
def test_read_training_config():
    lms = read_landmarks_list_to_train(
        os.path.join(REF_CFG, "rcr_training_22.cfg"))
    assert len(lms) == 22
    assert lms[:5] == ["9", "31", "32", "36", "37"]
    assert lms[-1] == "67"


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference cfg absent")
def test_read_eval_config():
    right, left = read_ied_definition(os.path.join(REF_CFG, "rcr_eval.cfg"))
    assert right == ["37", "40"]
    assert left == ["43", "46"]


def test_row_roundtrip_and_filter():
    names = [str(i) for i in range(1, 6)]
    coords = np.arange(10, dtype=np.float32).reshape(5, 2)
    lc = to_landmark_collection(
        np.concatenate([coords[:, 0], coords[:, 1]]), names)
    np.testing.assert_array_equal(lc.coordinates, coords)
    np.testing.assert_array_equal(to_row(lc),
                                  np.concatenate([coords[:, 0], coords[:, 1]]))
    sub = lc.filter(["3", "1"])
    assert sub.names == ["3", "1"]
    np.testing.assert_array_equal(sub.coordinates, coords[[2, 0]])


def test_get_ied_and_check_face():
    names = ["37", "40", "43", "46", "58"]
    coords = np.asarray([[0, 0], [2, 0], [8, 0], [10, 0], [5, 8]], np.float32)
    from superviseddescent_tpu.utils.landmarks import LandmarkCollection
    lc = LandmarkCollection(names, coords)
    # right center (1,0), left center (9,0) -> ied 8
    assert get_ied(lc, ["37", "40"], ["43", "46"]) == pytest.approx(8.0)
    assert check_face([(-1, -1, 20, 20)], lc)
    assert not check_face([(-1, -1, 4, 4)], lc)      # 46/58 outside
    assert not check_face([], lc)


def test_cereal_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    model = CerealDetectionModel(
        regressors=[
            CerealRegressor(rng.normal(size=(17, 4)).astype(np.float32),
                            regularisation_type=1, lambda_=1.5,
                            regularise_last_row=False)
            for _ in range(4)],
        norm_model_landmarks=["9", "31", "37"],
        norm_right_eye_ids=["37", "40"],
        norm_left_eye_ids=["43", "46"],
        mean=rng.normal(size=44).astype(np.float32),
        landmark_ids=["9", "31", "37"],
        hog_params=[CerealHoGParam(1, 5, cs, 4, rp)
                    for cs, rp in [(11, 1.0), (10, 0.7), (8, 0.4), (6, 0.25)]],
        right_eye_ids=["37", "40"],
        left_eye_ids=["43", "46"],
    )
    path = tmp_path / "model.bin"
    save_detection_model(model, path)
    loaded = load_detection_model(path)
    assert len(loaded.regressors) == 4
    for a, b in zip(model.regressors, loaded.regressors):
        np.testing.assert_array_equal(a.weights, b.weights)
        assert a.regularisation_type == b.regularisation_type
        assert a.lambda_ == pytest.approx(b.lambda_)
        assert a.regularise_last_row == b.regularise_last_row
    np.testing.assert_array_equal(model.mean, loaded.mean)
    assert loaded.landmark_ids == model.landmark_ids
    for a, b in zip(model.hog_params, loaded.hog_params):
        assert (a.vlhog_variant, a.num_cells, a.cell_size, a.num_bins) == \
               (b.vlhog_variant, b.num_cells, b.cell_size, b.num_bins)
        assert b.relative_patch_size == pytest.approx(a.relative_patch_size)
    assert loaded.norm_model_landmarks == model.norm_model_landmarks
    assert loaded.right_eye_ids == model.right_eye_ids
    assert loaded.left_eye_ids == model.left_eye_ids
    # byte-stability: writing the loaded model reproduces identical bytes
    path2 = tmp_path / "model2.bin"
    save_detection_model(loaded, path2)
    assert path.read_bytes() == path2.read_bytes()


def test_cereal_truncation_error(tmp_path):
    path = tmp_path / "bad.bin"
    path.write_bytes(b"\x03\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        load_detection_model(path)


def test_boost_mat_roundtrip(tmp_path):
    from superviseddescent_tpu.io import save_mats, load_mats, dumps_mats

    rng = np.random.default_rng(7)
    mats = [rng.normal(size=(3, 5)).astype(np.float32),
            rng.integers(0, 255, size=(4, 4)).astype(np.uint8),
            rng.normal(size=(1, 7)).astype(np.float64)]
    p = tmp_path / "mats.boost.bin"
    save_mats(p, mats)
    out = load_mats(p)
    assert len(out) == 3
    for a, b in zip(mats, out):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)

    # documented header framing (mat_serialization.hpp field order behind
    # a boost binary_oarchive header)
    blob = dumps_mats(mats[:1], library_version=17)
    assert blob[:8] == (22).to_bytes(8, "little")
    assert blob[8:30] == b"serialization::archive"
    assert blob[30:32] == (17).to_bytes(2, "little")
    assert blob[32:34] == b"\x00\x00"            # tracking, class version
    import struct as _s
    rows, cols, typ, cont = _s.unpack("<iii?", blob[34:47])
    assert (rows, cols, typ, cont) == (3, 5, 5, True)


def test_boost_mat_old_class_preamble():
    # very old boost binary archives encode the class version as u32
    from superviseddescent_tpu.io import dumps_mats, loads_mats
    m = np.arange(6, dtype=np.float32).reshape(2, 3)
    blob = dumps_mats([m])
    old = blob[:32] + b"\x00" + (0).to_bytes(4, "little") + blob[34:]
    out = loads_mats(old)
    np.testing.assert_array_equal(out[0], m)


def test_boost_mat_bad_signature():
    from superviseddescent_tpu.io import loads_mats
    with pytest.raises(ValueError):
        loads_mats(b"\x05\x00\x00\x00\x00\x00\x00\x00hello")


def test_boost_mat_empty_first_matrix():
    from superviseddescent_tpu.io import dumps_mats, loads_mats
    mats = [np.zeros((0, 3), np.float32), np.ones((2, 2), np.float32)]
    out = loads_mats(dumps_mats(mats))
    assert out[0].shape == (0, 3)
    np.testing.assert_array_equal(out[1], mats[1])
