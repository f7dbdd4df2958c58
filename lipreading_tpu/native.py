"""ctypes bindings for the native host preprocessing library (native/).

The reference's native layer is third-party C++ reached through Python
bindings (dlib/OpenCV — SURVEY.md §3 L0); this is the first-party equivalent:
a small C++ library implementing the same arithmetic contracts as the numpy
oracle, used where host-side preprocessing throughput matters (oracle
benchmarking, dataview builds without an accelerator). Built lazily with the
in-image g++ (pybind11 is unavailable; plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO = os.path.join(_DIR, "build", "liblipreading_host.so")
_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library if missing. Returns its path."""
    src = os.path.join(_DIR, "lipreading_host.cpp")
    if force or not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(src)
    ):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    return _SO


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(build())
    return _lib


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def grayscale(rgb: np.ndarray) -> np.ndarray:
    lib = load()
    h, w, _ = rgb.shape
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    out = np.empty((h, w), np.float32)
    lib.lr_grayscale(_ptr(rgb), h, w, _ptr(out))
    return out


def sample_roi(gray, box, out_size=96, mean=0.421, std=0.165,
               normalize=True) -> np.ndarray:
    lib = load()
    gray = _f32(gray)
    H, W = gray.shape
    x0, y0, size = (int(v) for v in box)
    out = np.empty((out_size, out_size), np.float32)
    lib.lr_sample_roi(
        _ptr(gray), H, W, x0, y0, size, out_size,
        ctypes.c_float(mean), ctypes.c_float(std),
        1 if normalize else 0, _ptr(out),
    )
    return out


def _ert_arrays(model):
    return (
        _f32(model.mean_shape), _i32(model.anchors), _f32(model.offsets),
        _i32(model.feat1), _i32(model.feat2), _f32(model.thresh),
        _f32(model.leaves),
    )


def ert_predict(model, gray, box) -> np.ndarray:
    lib = load()
    gray = _f32(gray)
    H, W = gray.shape
    ms, anc, off, f1, f2, th, lv = _ert_arrays(model)
    S, P = model.anchors.shape
    K = model.num_trees
    D = model.depth
    out = np.empty((68, 2), np.float32)
    lib.lr_ert_predict(
        _ptr(gray), H, W,
        ctypes.c_float(box[0]), ctypes.c_float(box[1]), ctypes.c_float(box[2]),
        _ptr(ms), _ptr(anc), _ptr(off), _ptr(f1), _ptr(f2), _ptr(th), _ptr(lv),
        S, P, K, D, _ptr(out),
    )
    return out


def preprocess_clip(model, frames, boxes, roi_margin=0.30, out_size=96,
                    mean=0.421, std=0.165, return_landmarks=False):
    """[T, H, W, 3] u8 + [T, 3] face boxes -> [T, R, R] normalized ROIs."""
    lib = load()
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    T, H, W, _ = frames.shape
    boxes = _f32(boxes)
    ms, anc, off, f1, f2, th, lv = _ert_arrays(model)
    S, P = model.anchors.shape
    rois = np.empty((T, out_size, out_size), np.float32)
    lms = np.empty((T, 68, 2), np.float32) if return_landmarks else None
    lib.lr_preprocess_clip(
        _ptr(frames), T, H, W, _ptr(boxes),
        _ptr(ms), _ptr(anc), _ptr(off), _ptr(f1), _ptr(f2), _ptr(th), _ptr(lv),
        S, P, model.num_trees, model.depth,
        ctypes.c_float(roi_margin), out_size,
        ctypes.c_float(mean), ctypes.c_float(std),
        _ptr(lms) if lms is not None else None, _ptr(rois),
    )
    return (rois, lms) if return_landmarks else rois
