"""ctypes bindings for the native C++ batch image loader.

native/ocr_loader.cc decodes + resizes + BGR->RGB converts a whole batch
on a persistent C++ thread pool, writing straight into a caller-owned
uint8 array — no GIL, no per-image Python round trips. Falls back to cv2
transparently when the shared library is absent (it auto-builds with
native/build.sh if a toolchain is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libocr_loader.so")


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        build = os.path.join(os.path.dirname(path), "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run([build], check=True, capture_output=True,
                               timeout=300)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ocr_loader_create.restype = ctypes.c_void_p
        lib.ocr_loader_create.argtypes = [ctypes.c_int]
        lib.ocr_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.ocr_loader_load_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


class NativeBatchLoader:
    """Batch decode+resize on a persistent C++ thread pool."""

    def __init__(self, num_threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native loader unavailable (build native/build.sh first)"
            )
        self._lib = lib
        self._handle = lib.ocr_loader_create(num_threads)

    def load_batch(self, paths: List[str], out_w: int, out_h: int
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (images (N,H,W,3) uint8 RGB, ok (N,) bool,
        src_hw (N,2) int32 original sizes)."""
        n = len(paths)
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        status = np.zeros(n, np.int32)
        src_hw = np.zeros((n, 2), np.int32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        self._lib.ocr_loader_load_batch(
            self._handle, arr, n, out_w, out_h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            src_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return out, status == 0, src_hw

    def close(self):
        if self._handle:
            self._lib.ocr_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
