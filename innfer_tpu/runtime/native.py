"""ctypes bindings + lazy build for the native C++ runtime.

The shared library (imgcodec + async loader) is compiled on first use with
g++ into ``innfer_tpu/runtime/build/``; all callers degrade gracefully to
the cv2 path when the toolchain or image libraries are unavailable.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "src")
_BUILD = osp.join(_HERE, "build")
_LIB_PATH = osp.join(_BUILD, "libinnfer_runtime.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile() -> bool:
    try:
        os.makedirs(_BUILD, exist_ok=True)
        srcs = [osp.join(_SRC, "imgcodec.cpp"), osp.join(_SRC, "loader.cpp")]
        newest_src = max(os.path.getmtime(s) for s in srcs)
    except OSError:
        # sources missing/unreadable (e.g. an installed tree without src/):
        # a prebuilt library, if present, is still usable
        return osp.exists(_LIB_PATH)
    if osp.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= newest_src:
        return True
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
        *srcs, "-lpng", "-ljpeg", "-lz", "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _compile():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # stale/truncated .so (interrupted g++) or missing shared deps
            # on this host: degrade to the cv2 fallback as documented
            # rather than crashing every read/save call
            _build_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.decode_png.argtypes = [ctypes.c_char_p, ctypes.POINTER(u8p)] + [ctypes.POINTER(ctypes.c_int)] * 3
        lib.decode_png.restype = ctypes.c_int
        lib.decode_jpeg.argtypes = lib.decode_png.argtypes
        lib.decode_jpeg.restype = ctypes.c_int
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.decode_png16.argtypes = [ctypes.c_char_p, ctypes.POINTER(u16p)] + [ctypes.POINTER(ctypes.c_int)] * 3
        lib.decode_png16.restype = ctypes.c_int
        lib.encode_png.argtypes = [ctypes.c_char_p, u8p] + [ctypes.c_int] * 4
        lib.encode_png.restype = ctypes.c_int
        lib.free_image.argtypes = [u8p]
        lib.loader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(u8p)] + [ctypes.POINTER(ctypes.c_int)] * 4
        lib.loader_next.restype = ctypes.c_int
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _take_buffer(lib, data_p, h: int, w: int, c: int) -> np.ndarray:
    n = h * w * c
    arr = np.ctypeslib.as_array(data_p, shape=(n,)).reshape(h, w, c).copy()
    lib.free_image(data_p)
    if c == 1:
        arr = arr[:, :, 0]
    return arr


def decode(path: str) -> Optional[np.ndarray]:
    """Native decode -> HWC BGR uint8/uint16 (HW for gray); None -> fallback."""
    lib = get_lib()
    if lib is None:
        return None
    data_p = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    low = path.lower()
    if low.endswith(".png"):
        rc = lib.decode_png(path.encode(), ctypes.byref(data_p),
                            ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
        if rc == -3:  # IMG_ERR_UNSUPPORTED: 16-bit PNG
            data16 = ctypes.POINTER(ctypes.c_uint16)()
            rc = lib.decode_png16(path.encode(), ctypes.byref(data16),
                                  ctypes.byref(h), ctypes.byref(w),
                                  ctypes.byref(c))
            if rc != 0:
                return None
            n = h.value * w.value * c.value
            arr = np.ctypeslib.as_array(data16, shape=(n,)).reshape(
                h.value, w.value, c.value).copy()
            lib.free_image(ctypes.cast(data16,
                                       ctypes.POINTER(ctypes.c_uint8)))
            return arr[:, :, 0] if c.value == 1 else arr
    elif low.endswith((".jpg", ".jpeg")):
        rc = lib.decode_jpeg(path.encode(), ctypes.byref(data_p),
                             ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    else:
        return None
    if rc != 0:
        return None
    return _take_buffer(lib, data_p, h.value, w.value, c.value)


def encode_png(path: str, img: np.ndarray, compression_level: int = 1) -> bool:
    """Native PNG encode of an HWC BGR (or HW gray) uint8 array."""
    lib = get_lib()
    if lib is None or img.dtype != np.uint8:
        return False
    if img.ndim == 2:
        img = img[:, :, None]
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    rc = lib.encode_png(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c, compression_level,
    )
    return rc == 0


class PrefetchLoader:
    """Iterate (index, path, image) with background native decoding.

    Images the native codec cannot handle (16-bit PNG, TIFF, DNG, ...) are
    transparently decoded with the cv2 fallback on the consumer thread.
    """

    def __init__(self, paths: List[str], capacity: int = 4, threads: int = 2,
                 fallback=None):
        self.paths = list(paths)
        self.fallback = fallback
        self._lib = get_lib()
        self._handle = None
        if self._lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._keepalive = arr
            self._handle = self._lib.loader_create(arr, len(self.paths),
                                                   capacity, threads)

    def __iter__(self) -> Iterator[Tuple[int, str, Optional[np.ndarray]]]:
        if self._handle is None:
            for i, p in enumerate(self.paths):
                yield i, p, self.fallback(p) if self.fallback else None
            return
        lib = self._lib
        for _ in range(len(self.paths)):
            data_p = ctypes.POINTER(ctypes.c_uint8)()
            h = ctypes.c_int()
            w = ctypes.c_int()
            c = ctypes.c_int()
            idx = ctypes.c_int()
            rc = lib.loader_next(self._handle, ctypes.byref(data_p),
                                 ctypes.byref(h), ctypes.byref(w),
                                 ctypes.byref(c), ctypes.byref(idx))
            if rc == 1:
                return
            path = self.paths[idx.value]
            if rc == 0:
                img = _take_buffer(lib, data_p, h.value, w.value, c.value)
            else:
                img = self.fallback(path) if self.fallback else None
            yield idx.value, path, img

    def close(self):
        if self._handle is not None:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
