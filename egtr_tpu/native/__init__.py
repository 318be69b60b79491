"""Native (C++) host-side kernels, built on demand and bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; these cover the host-side hot loops
the reference implements natively (Cython bbox kernel + eval matching).
Build: ``g++ -O3 -shared`` at first import, cached next to the source.
Falls back silently to numpy implementations if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bbox_kernels.cpp")
_LIB_PATH = os.path.join(_HERE, "_bbox_kernels.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        up = ctypes.POINTER(ctypes.c_uint8)
        lib.bbox_overlaps_plus1.argtypes = [dp, ctypes.c_int64, dp,
                                            ctypes.c_int64, dp]
        lib.bbox_intersections_plus1.argtypes = lib.bbox_overlaps_plus1.argtypes
        lib.triplet_matches.argtypes = [
            ip, dp, ctypes.c_int64, ip, dp, ctypes.c_int64,
            ctypes.c_double, ctypes.c_int, up]
        _lib = lib
        return _lib


def _as(arr, dtype):
    return np.ascontiguousarray(arr, dtype=dtype)


def bbox_overlaps(boxes: np.ndarray, query_boxes: np.ndarray) -> np.ndarray:
    """[n,4] x [k,4] -> [n,k] IoU (+1 convention). C++ fast path."""
    lib = get_lib()
    boxes = _as(boxes, np.float64).reshape(-1, 4)
    query = _as(query_boxes, np.float64).reshape(-1, 4)
    n, k = len(boxes), len(query)
    if lib is None:
        from ..evaluation.sg_eval import bbox_overlaps_plus1
        return bbox_overlaps_plus1(boxes, query)
    out = np.empty((n, k), np.float64)
    lib.bbox_overlaps_plus1(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def triplet_matches(gt_triplets, gt_boxes, pred_triplets, pred_boxes,
                    iou_thresh: float = 0.5, phrdet: bool = False
                    ) -> Optional[np.ndarray]:
    """Dense [n_gt, n_pred] uint8 match matrix, or None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    gt_t = _as(gt_triplets, np.int64).reshape(-1, 3)
    gt_b = _as(gt_boxes, np.float64).reshape(-1, 8)
    pr_t = _as(pred_triplets, np.int64).reshape(-1, 3)
    pr_b = _as(pred_boxes, np.float64).reshape(-1, 8)
    n_gt, n_pred = len(gt_t), len(pr_t)
    out = np.empty((n_gt, n_pred), np.uint8)
    lib.triplet_matches(
        gt_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gt_b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_gt,
        pr_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pr_b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_pred,
        iou_thresh, int(phrdet),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
