"""ctypes bindings for the native host-runtime library (native/sdtpu_host.cpp).

The TPU compute path is XLA/Pallas; this native library is the host-side
counterpart (the role OpenCV/VLFeat play in the reference): fast colour
conversion, patch extraction, and a CPU HOG used as a fallback and as an
independent cross-check of the XLA kernels. Auto-builds on first use if a
compiler is available; all callers must handle `available() == False`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsdtpu_host.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        build = os.path.join(_NATIVE_DIR, "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.sdtpu_version.restype = ctypes.c_int
    lib.sdtpu_rgb_to_gray_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.sdtpu_extract_patch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.sdtpu_hog.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.sdtpu_hog_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rgb_to_gray_u8(rgb: np.ndarray) -> np.ndarray:
    lib = _load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    n = rgb.size // 3
    out = np.empty(rgb.shape[:-1], np.uint8)
    lib.sdtpu_rgb_to_gray_u8(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def extract_patch(image: np.ndarray, center_x: float, center_y: float,
                  patch_half: int, out_size: int,
                  quantize: bool = True) -> np.ndarray:
    lib = _load()
    image = np.ascontiguousarray(image, np.float32)
    out = np.empty((out_size, out_size), np.float32)
    lib.sdtpu_extract_patch(_fptr(image), image.shape[0], image.shape[1],
                            float(center_x), float(center_y),
                            int(patch_half), int(out_size), int(quantize),
                            _fptr(out))
    return out


def hog(patch: np.ndarray, cell_size: int, num_orientations: int,
        variant: int = 1) -> np.ndarray:
    """CPU HOG: (S, S) patch -> (C, C, D) channels-last descriptor."""
    lib = _load()
    patch = np.ascontiguousarray(patch, np.float32)
    s = patch.shape[0]
    c = (s + cell_size // 2) // cell_size
    d = 3 * num_orientations + 4 if variant == 1 else 4 * num_orientations
    out = np.empty((c, c, d), np.float32)
    lib.sdtpu_hog(_fptr(patch), s, cell_size, num_orientations, variant,
                  _fptr(out))
    return out


def hog_batch(patches: np.ndarray, cell_size: int, num_orientations: int,
              variant: int = 1) -> np.ndarray:
    """(B, S, S) -> (B, C, C, D), OpenMP-parallel over the batch."""
    lib = _load()
    patches = np.ascontiguousarray(patches, np.float32)
    b, s, _ = patches.shape
    c = (s + cell_size // 2) // cell_size
    d = 3 * num_orientations + 4 if variant == 1 else 4 * num_orientations
    out = np.empty((b, c, c, d), np.float32)
    lib.sdtpu_hog_batch(_fptr(patches), b, s, cell_size, num_orientations,
                        variant, _fptr(out))
    return out
