"""
ctypes bindings for the native C++ frame loader (native/frameloader.cpp):
multithreaded libpng decode + bilinear resize + float32 normalization for
whole frame batches. Compiled on first use with g++; falls back to PIL when
the toolchain or libpng is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "frameloader.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libframeloader.so")

_lib = None
_unavailable = False


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", _SRC, "-lpng", "-lz", "-lpthread",
           "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _unavailable
    if _lib is not None or _unavailable:
        return _lib
    try:
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.fl_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.fl_load_batch.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _unavailable = True
    return _lib


def load_frames(paths, out_h, out_w, num_threads=0):
    """
    Decode a list of PNG paths -> (N, out_h, out_w, 3) float32 in [0,1],
    using the native loader. Raises RuntimeError if unavailable or if any
    frame fails to decode.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native frame loader unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.fl_load_batch(arr, n, out_h, out_w,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           num_threads)
    if ok != n:
        raise RuntimeError(f"native loader decoded {ok}/{n} frames")
    return out


def available():
    return get_lib() is not None
