"""Native (C++) kernels, built on demand with g++ and loaded via ctypes.

Analog of the reference's JIT op builder (`/root/reference/yolox/layers/
jit_ops.py`), without the torch cpp_extension dependency: a single g++
invocation produces a cached shared library next to the source (or in
$YOLOX_HOME/native when the package directory is read-only). Multi-process
builds are serialized with an exclusive lock file; everything degrades
gracefully to the pure-python implementations when no compiler exists.
"""

from __future__ import annotations

import ctypes
import fcntl
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

from yolox_tpu.utils.logger import logger

_NATIVE_DIR = Path(__file__).parent
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _cache_dir() -> Path:
    if os.access(_NATIVE_DIR, os.W_OK):
        return _NATIVE_DIR
    home = Path(os.environ.get(
        "YOLOX_HOME", str(Path.home() / ".cache" / "yolox")))
    d = home / "native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build(src: Path, out: Path) -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           str(src), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning(f"native build failed ({e}); using python fallback")
        return False


def load_cocoeval_lib() -> Optional[ctypes.CDLL]:
    """Build (once) and load the cocoeval kernel; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True

    src = _NATIVE_DIR / "cocoeval.cpp"
    out = _cache_dir() / "libcocoeval.so"
    lock_path = out.with_suffix(".lock")
    try:
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if (not out.exists()
                    or out.stat().st_mtime < src.stat().st_mtime):
                if not _build(src, out):
                    return None
        lib = ctypes.CDLL(str(out))
    except OSError as e:
        logger.warning(f"native load failed ({e}); using python fallback")
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.cocoeval_evaluate.restype = None
    lib.cocoeval_evaluate.argtypes = [
        ctypes.c_int64, i64p, i64p, i64p,          # groups
        f64p,                                       # dt_areas
        f64p, u8p, u8p, f64p,                       # gts + ious
        ctypes.c_int64, f64p,                       # thresholds
        ctypes.c_int64, f64p,                       # area ranges
        ctypes.c_int64,                             # max_det
        i64p, i64p, u8p, u8p, u8p,                  # outputs
    ]
    _lib = lib
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def cocoeval_evaluate_native(dt_off, gt_off, iou_off, dt_areas, gt_areas,
                             gt_iscrowd, gt_ignore_base, ious, iou_thrs,
                             area_rngs, max_det):
    """ctypes wrapper; returns (dt_matched, dt_ignored, gt_ignored,
    out_dt_off, out_gt_off). See cocoeval.cpp for the layout."""
    lib = load_cocoeval_lib()
    assert lib is not None

    n_groups = len(dt_off) - 1
    n_area = len(area_rngs)
    n_thr = len(iou_thrs)

    dt_counts = np.minimum(np.diff(dt_off), max_det)
    gt_counts = np.diff(gt_off)
    out_dt_off = np.zeros(n_groups * n_area + 1, np.int64)
    out_gt_off = np.zeros(n_groups * n_area + 1, np.int64)
    for g in range(n_groups):
        for a in range(n_area):
            r = g * n_area + a
            out_dt_off[r + 1] = out_dt_off[r] + dt_counts[g]
            out_gt_off[r + 1] = out_gt_off[r] + gt_counts[g]

    dt_matched = np.zeros(int(out_dt_off[-1]) * n_thr, np.uint8)
    dt_ignored = np.zeros(int(out_dt_off[-1]) * n_thr, np.uint8)
    gt_ignored = np.zeros(int(out_gt_off[-1]), np.uint8)

    c = np.ascontiguousarray
    area_rngs = np.asarray(area_rngs, np.float64).reshape(-1)
    lib.cocoeval_evaluate(
        ctypes.c_int64(n_groups),
        _ptr(c(dt_off, np.int64), ctypes.c_int64),
        _ptr(c(gt_off, np.int64), ctypes.c_int64),
        _ptr(c(iou_off, np.int64), ctypes.c_int64),
        _ptr(c(dt_areas, np.float64), ctypes.c_double),
        _ptr(c(gt_areas, np.float64), ctypes.c_double),
        _ptr(c(gt_iscrowd, np.uint8), ctypes.c_uint8),
        _ptr(c(gt_ignore_base, np.uint8), ctypes.c_uint8),
        _ptr(c(ious, np.float64), ctypes.c_double),
        ctypes.c_int64(n_thr),
        _ptr(c(iou_thrs, np.float64), ctypes.c_double),
        ctypes.c_int64(n_area),
        _ptr(c(area_rngs, np.float64), ctypes.c_double),
        ctypes.c_int64(max_det),
        _ptr(out_dt_off, ctypes.c_int64),
        _ptr(out_gt_off, ctypes.c_int64),
        _ptr(dt_matched, ctypes.c_uint8),
        _ptr(dt_ignored, ctypes.c_uint8),
        _ptr(gt_ignored, ctypes.c_uint8),
    )
    return dt_matched, dt_ignored, gt_ignored, out_dt_off, out_gt_off
