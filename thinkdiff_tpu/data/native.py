"""ctypes bindings for the native IO library (native/thinkdiff_io.cc).

Auto-builds the .so on first use (cached); every caller must handle
``available() == False`` — the pure-Python paths remain the fallback.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libthinkdiff_io.so")
_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_NATIVE_DIR, "thinkdiff_io.cc")
            if not os.path.exists(src):
                return None
            try:
                subprocess.run(
                    ["bash", os.path.join(_NATIVE_DIR, "build.sh")],
                    check=True, capture_output=True, timeout=180,
                )
            except Exception as e:
                logger.warning("native build failed: %s", e)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native load failed: %s", e)
            return None
        lib.tdio_open_tar.restype = ctypes.c_void_p
        lib.tdio_open_tar.argtypes = [ctypes.c_char_p]
        lib.tdio_num_members.restype = ctypes.c_long
        lib.tdio_num_members.argtypes = [ctypes.c_void_p]
        lib.tdio_member_info.restype = ctypes.c_long
        lib.tdio_member_info.argtypes = [
            ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_long,
        ]
        lib.tdio_close_tar.argtypes = [ctypes.c_void_p]
        lib.tdio_pread.restype = ctypes.c_long
        lib.tdio_pread.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.tdio_jpeg_info.restype = ctypes.c_int
        lib.tdio_jpeg_info.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.tdio_jpeg_decode.restype = ctypes.c_int
        lib.tdio_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.tdio_decode_resize_normalize.restype = ctypes.c_int
        lib.tdio_decode_batch.restype = ctypes.c_int
        lib.tdio_decode_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeTarIndex:
    """Member table of one tar: [(name, data_offset, size)]."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO unavailable")
        self.path = path
        handle = lib.tdio_open_tar(path.encode())
        if not handle:
            raise FileNotFoundError(path)
        try:
            n = lib.tdio_num_members(handle)
            self.members: List[Tuple[str, int, int]] = []
            off = ctypes.c_int64()
            size = ctypes.c_int64()
            buf = ctypes.create_string_buffer(4096)
            for i in range(n):
                lib.tdio_member_info(handle, i, ctypes.byref(off),
                                     ctypes.byref(size), buf, 4096)
                self.members.append((buf.value.decode(), off.value, size.value))
        finally:
            lib.tdio_close_tar(handle)

    def read(self, offset: int, size: int) -> bytes:
        lib = _load()
        out = ctypes.create_string_buffer(size)
        got = lib.tdio_pread(self.path.encode(), offset, size, out)
        if got != size:
            raise IOError(f"short read {got}/{size} at {offset}")
        return out.raw


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W, 3) uint8."""
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.tdio_jpeg_info(data, len(data), ctypes.byref(w),
                          ctypes.byref(h)) != 0:
        raise ValueError("bad jpeg")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.tdio_jpeg_decode(
        data, len(data), out.ctypes.data_as(ctypes.c_char_p),
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise ValueError("jpeg decode failed")
    return out


def decode_resize_normalize_batch(
    jpegs: List[bytes], target: int, mean, std, nthreads: int = 8
) -> np.ndarray:
    """[(jpeg bytes)] -> (N, target, target, 3) float32 normalized HWC,
    decoded + bicubic-resized in a native thread pool."""
    lib = _load()
    n = len(jpegs)
    blob = b"".join(jpegs)
    offsets = np.zeros(n, np.int64)
    sizes = np.asarray([len(j) for j in jpegs], np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    out = np.empty((n, target, target, 3), np.float32)
    mean_arr = np.asarray(mean, np.float32)
    std_arr = np.asarray(std, np.float32)
    failed = lib.tdio_decode_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, target, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads,
    )
    if failed:
        raise ValueError(f"{failed}/{n} jpegs failed to decode")
    return out
