"""ctypes bindings for the native C++ image loader (native/image_loader.cpp).

Builds the shared library on first use (g++ + libpng are part of the
environment); falls back to PIL transparently when unavailable so the
framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess

import numpy as np

log = logging.getLogger("cv_tpu.native")

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libcvtpu_loader.so"
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.cvtpu_load_gray.restype = ctypes.c_int
        lib.cvtpu_load_gray.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.cvtpu_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.cvtpu_loader_create.restype = ctypes.c_void_p
        lib.cvtpu_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.cvtpu_loader_get.restype = ctypes.c_int
        lib.cvtpu_loader_get.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.cvtpu_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # pragma: no cover - environment dependent
        log.warning("native loader unavailable (%s); falling back to PIL", e)
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_gray(path) -> np.ndarray:
    """Load a PNG as (H, W) uint8 grayscale via the native decoder, falling
    back to PIL for other formats or when the library is missing."""
    lib = _get_lib()
    if lib is not None and str(path).lower().endswith(".png"):
        buf = ctypes.POINTER(ctypes.c_uint8)()
        w = ctypes.c_int()
        h = ctypes.c_int()
        status = lib.cvtpu_load_gray(
            str(path).encode(), ctypes.byref(buf), ctypes.byref(w), ctypes.byref(h)
        )
        if status == 0:
            try:
                arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value)).copy()
            finally:
                lib.cvtpu_free(buf)
            return arr
        log.warning("native decode failed (%d) for %s; PIL fallback", status, path)
    from ..akaze.extract import load_gray as pil_load

    return pil_load(path)


class PrefetchLoader:
    """Threaded prefetching image loader (the native data-loader runtime).

    Decodes ``paths`` on a worker pool concurrently with device compute::

        with PrefetchLoader(paths, threads=4) as loader:
            for i in range(len(paths)):
                image = loader.get(i)   # blocks only if not yet decoded
    """

    def __init__(self, paths, threads: int = 4):
        self.paths = [str(p) for p in paths]
        self._lib = _get_lib()
        self._handle = None
        if self._lib is not None and all(
            p.lower().endswith(".png") for p in self.paths
        ):
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._handle = self._lib.cvtpu_loader_create(
                arr, len(self.paths), threads
            )

    def __len__(self):
        return len(self.paths)

    def get(self, index: int) -> np.ndarray:
        if self._handle is not None:
            buf = ctypes.POINTER(ctypes.c_uint8)()
            w = ctypes.c_int()
            h = ctypes.c_int()
            status = self._lib.cvtpu_loader_get(
                self._handle, index, ctypes.byref(buf), ctypes.byref(w), ctypes.byref(h)
            )
            if status == 0:
                return np.ctypeslib.as_array(buf, shape=(h.value, w.value)).copy()
        return load_gray(self.paths[index])

    def close(self):
        if self._handle is not None:
            self._lib.cvtpu_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
