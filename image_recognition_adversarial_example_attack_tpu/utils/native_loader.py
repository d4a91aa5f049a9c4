"""ctypes binding for the native threaded image loader (native/loader.cc).

Builds the shared object on first use (g++ + libjpeg, both in the image)
and degrades silently to the PIL path when unavailable.  Decode failures
are per-image: the C side flags them and the wrapper re-decodes just those
with PIL (error isolation, mirroring the reference's per-image try/except).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Sequence

import numpy as np

from ..core.constants import IMAGE_SIZE, RESIZE_SIZE

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libadvloader.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _load_library() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = _NATIVE_DIR / "loader.cc"
        stale = (
            src.is_file()
            and _SO_PATH.is_file()
            and src.stat().st_mtime > _SO_PATH.stat().st_mtime
        )
        if not _SO_PATH.is_file() or stale:
            if not src.is_file():
                _build_failed = True
                return None
            try:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR), "libadvloader.so"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
            lib.load_batch.restype = ctypes.c_int
            lib.load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ]
            assert lib.loader_abi_version() == 2  # v2 adds PNG/BMP decode
            _lib = lib
            return _lib
        except Exception:
            _build_failed = True
            return None


def native_available() -> bool:
    return _load_library() is not None


def load_batch_native_with_status(
    paths: Sequence[str | Path],
    size: int = IMAGE_SIZE,
    resize_to: int | None = None,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Raw native decode: ([B, size, size, 3] float32, ok[B] int32).

    ``ok[i] == 0`` rows are undecoded (non-JPEG/corrupt/no library) and
    contain garbage — callers must fall back or drop them.
    """
    n = len(paths)
    if n == 0:
        raise ValueError("empty path list")
    if resize_to is None:
        # scale the resize edge with the crop, like core.images.load_image
        resize_to = max(size, round(size * RESIZE_SIZE / IMAGE_SIZE))
    out = np.empty((n, size, size, 3), np.float32)
    ok = np.zeros((n,), np.int32)
    lib = _load_library()
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
        lib.load_batch(
            c_paths, n, int(resize_to), size, n_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    return out, ok


def load_image_batch_native(
    paths: Sequence[str | Path],
    size: int = IMAGE_SIZE,
    resize_to: int | None = None,
    n_threads: int = 0,
) -> np.ndarray:
    """[B, size, size, 3] float32 in [0,1]; PIL fallback per failed image."""
    out, ok = load_batch_native_with_status(paths, size=size,
                                            resize_to=resize_to,
                                            n_threads=n_threads)
    if not np.all(ok == 1):
        from ..core.images import load_image

        for i in np.nonzero(ok == 0)[0]:
            out[i] = load_image(paths[i], size=size)[0]
    return out
