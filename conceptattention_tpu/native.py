"""ctypes bindings for the native eval-ops library (native/eval_ops.cpp).

Compiles on first use with g++ (cached next to the source); every entry point
has a numpy fallback so the framework works without a toolchain. pybind11 is
not in this image — plain C ABI + ctypes per the environment contract.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "eval_ops.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libeval_ops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not os.path.exists(_SRC) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.nearest_resize_f32.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                           f32p, ctypes.c_int64, ctypes.c_int64]
        lib.hist_iou_i64.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p]
        lib.pix_acc_i64.argtypes = [i64p, i64p, ctypes.c_int64, i64p]
        lib.gaussian_blur3_f32.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                           ctypes.c_float, f32p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def nearest_resize(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """[h, w] float -> [oh, ow] nearest-neighbor (harness index mapping)."""
    lib = get_lib()
    src32 = np.ascontiguousarray(src, dtype=np.float32)
    if lib is None:
        h, w = src32.shape
        rows = (np.arange(oh) * h // oh).clip(0, h - 1)
        cols = (np.arange(ow) * w // ow).clip(0, w - 1)
        return src32[rows][:, cols]
    dst = np.empty((oh, ow), np.float32)
    lib.nearest_resize_f32(_f32p(src32), src32.shape[0], src32.shape[1],
                           _f32p(dst), oh, ow)
    return dst


def hist_iou(pred: np.ndarray, target: np.ndarray, nclass: int) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    if lib is None:
        from conceptattention_tpu.evals import metrics

        return metrics._intersection_union_np(pred, target, nclass)
    p = np.ascontiguousarray(pred, dtype=np.int64).ravel()
    t = np.ascontiguousarray(target, dtype=np.int64).ravel()
    inter = np.zeros(nclass, np.int64)
    uni = np.zeros(nclass, np.int64)
    lib.hist_iou_i64(_i64p(p), _i64p(t), p.size, nclass, _i64p(inter), _i64p(uni))
    return inter, uni


def pix_acc(pred: np.ndarray, target: np.ndarray) -> Tuple[int, int]:
    lib = get_lib()
    if lib is None:
        from conceptattention_tpu.evals import metrics

        return metrics._pix_accuracy_np(pred, target)
    p = np.ascontiguousarray(pred, dtype=np.int64).ravel()
    t = np.ascontiguousarray(target, dtype=np.int64).ravel()
    out = np.zeros(2, np.int64)
    lib.pix_acc_i64(_i64p(p), _i64p(t), p.size, _i64p(out))
    return int(out[0]), int(out[1])


def gaussian_blur3(src: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    lib = get_lib()
    src32 = np.ascontiguousarray(src, dtype=np.float32)
    if lib is None:
        from conceptattention_tpu.evals.segmentation import gaussian_blur_3x3

        return gaussian_blur_3x3(src32, sigma).astype(np.float32)
    if src32.ndim == 2:
        dst = np.empty_like(src32)
        lib.gaussian_blur3_f32(_f32p(src32), src32.shape[0], src32.shape[1],
                               ctypes.c_float(sigma), _f32p(dst))
        return dst
    # Any rank: blur over the LAST two axes (h, w); leading axes flatten to a
    # batch (a naive per-[0] loop passed wrong dims for 4D+ inputs).
    h, w = src32.shape[-2], src32.shape[-1]
    flat = src32.reshape(-1, h, w)
    dst = np.empty_like(flat)
    for i in range(flat.shape[0]):
        s = np.ascontiguousarray(flat[i])
        d = np.empty_like(s)
        lib.gaussian_blur3_f32(_f32p(s), h, w, ctypes.c_float(sigma), _f32p(d))
        dst[i] = d
    return dst.reshape(src32.shape)
