"""Native (C++) runtime components, loaded via ctypes with build-on-demand.

The reference's native surface is the DCNv2 C++/CUDA extension (SURVEY §2.1). Here
the TPU compute path is Pallas/XLA; the native pieces are host-side runtime kernels:
  * iou3d       — exact oriented-box IoU + symmetry sweep (eval hot loop; replaces
                  per-pair scipy ConvexHull calls);
  * dcn_cpu     — independent CPU DCNv2 forward used as a parity oracle for the
                  Pallas/XLA kernels.

The shared library is compiled with g++ on first use and cached next to the
sources; every entry point has a pure-Python fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SOURCES = ("iou3d.cpp", "dcn_cpu.cpp")
_LIB_NAME = "libcenterpose_native.so"


def _build() -> Optional[str]:
    # The cache is keyed on a content hash of the sources (stamped next to the
    # .so), NOT on mtimes: git does not preserve mtimes, and `-march=native`
    # output must never be loaded stale or on a different host's checkout.
    import hashlib

    src_dir = os.path.abspath(_SRC_DIR)
    out = os.path.join(src_dir, _LIB_NAME)
    stamp = out + ".sha256"
    srcs = [os.path.join(src_dir, s) for s in _SOURCES]
    if not all(os.path.exists(s) for s in srcs):
        return None
    h = hashlib.sha256()
    for s in srcs:
        with open(s, "rb") as f:
            h.update(f.read())
    digest = h.hexdigest()
    if os.path.exists(out) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == digest:
                return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    with open(stamp, "w") as f:
        f.write(digest)
    return out


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            path = _build()
            if path:
                lib = ctypes.CDLL(path)
                d = ctypes.POINTER(ctypes.c_double)
                lib.iou3d.restype = ctypes.c_double
                lib.iou3d.argtypes = [d] * 6
                lib.iou3d_symmetry_sweep.restype = ctypes.c_double
                lib.iou3d_symmetry_sweep.argtypes = [d] * 6 + [ctypes.c_int]
                f = ctypes.POINTER(ctypes.c_float)
                lib.dcn_v2_forward_cpu.restype = None
                lib.dcn_v2_forward_cpu.argtypes = [f] * 6 + [ctypes.c_int] * 12
                _LIB = lib
        return _LIB


def _as_dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def iou3d_native(r1, t1, s1, r2, t2, s2) -> Optional[float]:
    lib = get_lib()
    if lib is None:
        return None
    args = [
        np.ascontiguousarray(np.asarray(a, np.float64))
        for a in (r1, t1, s1, r2, t2, s2)
    ]
    return float(lib.iou3d(*[_as_dptr(a) for a in args]))


def iou3d_sweep_native(r1, t1, s1, r2, t2, s2, n: int) -> Optional[float]:
    lib = get_lib()
    if lib is None:
        return None
    args = [
        np.ascontiguousarray(np.asarray(a, np.float64))
        for a in (r1, t1, s1, r2, t2, s2)
    ]
    return float(
        lib.iou3d_symmetry_sweep(*[_as_dptr(a) for a in args], int(n))
    )


def dcn_forward_native(x, offset, mask, weight, bias, stride=1, pad=1, dilation=1):
    """NHWC DCNv2 forward on CPU; returns None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    offset = np.ascontiguousarray(np.asarray(offset, np.float32))
    mask = np.ascontiguousarray(np.asarray(mask, np.float32))
    weight = np.ascontiguousarray(np.asarray(weight, np.float32))
    bias = np.ascontiguousarray(np.asarray(bias, np.float32))
    b, h, w, c = x.shape
    kh, kw, _, co = weight.shape
    ho, wo = offset.shape[1], offset.shape[2]
    out = np.zeros((b, ho, wo, co), np.float32)

    fptr = ctypes.POINTER(ctypes.c_float)
    lib.dcn_v2_forward_cpu(
        x.ctypes.data_as(fptr),
        offset.ctypes.data_as(fptr),
        mask.ctypes.data_as(fptr),
        weight.ctypes.data_as(fptr),
        bias.ctypes.data_as(fptr),
        out.ctypes.data_as(fptr),
        b, h, w, c, ho, wo, co, kh, kw, stride, pad, dilation,
    )
    return out
