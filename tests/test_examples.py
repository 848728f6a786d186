"""Smoke tests for the runnable example scripts.

The reference treats its examples as de-facto integration tests
(SURVEY.md §4); simple_function and pose_estimation math is pinned in
test_cascade_convergence.py / test_pose_estimation.py, so here we execute
the example *scripts* end-to-end and check their printed results —
in particular landmark_detection (landmark_detection.cpp:368-471), which
previously had manual-run validation only.
"""

import importlib.util
import io
import os
import sys
from contextlib import redirect_stdout

import numpy as np

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_landmark_detection_example(tmp_path):
    mod = _load("landmark_detection")
    buf = io.StringIO()
    # run from tmp so any incidental outputs never land in the repo
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with redirect_stdout(buf):
            mod.main()
    finally:
        os.chdir(cwd)
    out = buf.getvalue()
    line = [l for l in out.splitlines() if "IOD-normalised" in l]
    assert line, out
    err = float(line[0].rsplit(":", 1)[1])
    # hello-world config on its own 5 training images: the reference's
    # manual run measured 0.0083; anything in that class is a pass
    assert err < 0.05, out
    assert "Saved" in out


def test_simple_function_example():
    mod = _load("simple_function")
    buf = io.StringIO()
    with redirect_stdout(buf):
        mod.main()
    out = buf.getvalue()
    line = [l for l in out.splitlines() if l.startswith("test residual")]
    assert line, out
    res = float(line[0].split(":")[1].split()[0])
    np.testing.assert_allclose(res, 0.026157, atol=5e-6)


def test_pose_estimation_example():
    mod = _load("pose_estimation")
    buf = io.StringIO()
    with redirect_stdout(buf):
        mod.main()
    out = buf.getvalue()
    line = [l for l in out.splitlines() if l.startswith("Predicted pose")]
    assert line, out
    import re
    nums = [float(v) for v in re.findall(r"-?\d+\.\d+", line[0])]
    pitch, yaw, roll = nums[:3]
    # reference expectation: approx 11 / -25 / -10 (pose_estimation.cpp:325-334)
    assert abs(pitch - 11.0) < 1.0 and abs(yaw + 25.0) < 1.0 \
        and abs(roll + 10.0) < 1.0, out
