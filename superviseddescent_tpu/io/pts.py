"""ibug .pts landmark file parser.

Parity with the reference reader
(/root/reference/include/rcr/landmarks_io.hpp:43-85): skip 3 header lines,
name landmarks "1".."68" in file order, and subtract 1.0 from both
coordinates (Matlab 1-based -> C 0-based origin).
"""

from __future__ import annotations

import numpy as np

from superviseddescent_tpu.utils.landmarks import LandmarkCollection


def write_pts_landmarks(filename, landmarks: LandmarkCollection) -> None:
    """Write an ibug .pts file (the inverse of ``read_pts_landmarks``:
    coordinates are stored 1-based, as the ibug annotations are). The
    reference only reads this format (landmarks_io.hpp:43-85); the writer
    rounds the trip so tooling can emit training data the reader accepts.

    The format carries NO names — the reader names points "1".."N" in
    file order — so only collections whose names already are the
    sequential "1".."N" ids survive a round trip. Writing e.g. a
    22-landmark model subset (ibug names "9","31",...) would silently
    come back renamed "1".."22" and scramble landmark correspondence, so
    that is rejected here (ADVICE r3).
    """
    expect = [str(i + 1) for i in range(len(landmarks))]
    if list(landmarks.names) != expect:
        raise ValueError(
            ".pts carries no landmark names (read_pts_landmarks renames "
            "points '1'..'N' in file order): refusing to write a "
            f"collection named {list(landmarks.names)[:4]}... — filter/"
            "reorder to sequential ibug ids first")
    c = np.asarray(landmarks.coordinates, np.float32)
    with open(filename, "w") as f:
        f.write("version: 1\n")
        f.write(f"n_points:  {len(landmarks)}\n")
        f.write("{\n")
        for x, y in c:
            f.write(f"{x + 1.0:.6f} {y + 1.0:.6f}\n")
        f.write("}\n")


def read_pts_landmarks(filename) -> LandmarkCollection:
    names = []
    coords = []
    with open(filename, "r") as f:
        lines = f.readlines()
    if len(lines) < 4:
        raise ValueError(f"not a .pts file (too short): {filename}")
    ibug_id = 1
    for line in lines[3:]:
        line = line.strip()
        if line == "}" or not line:
            break
        parts = line.split()
        if len(parts) < 2:
            raise ValueError(
                f"Landmark format error while parsing the line: {line}")
        try:
            x, y = float(parts[0]), float(parts[1])
        except ValueError as e:
            raise ValueError(
                f"Landmark format error while parsing the line: {line}") from e
        names.append(str(ibug_id))
        coords.append((np.float32(x) - 1.0, np.float32(y) - 1.0))
        ibug_id += 1
    return LandmarkCollection(names, np.asarray(coords, np.float32))
