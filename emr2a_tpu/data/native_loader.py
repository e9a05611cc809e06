"""ctypes binding for the C++ decode pool (native/decode_pool.cpp).

Compiles the shared library on first use (g++ + libjpeg/libpng) and
caches it next to the source; falls back to the cv2/PIL path in
data/images.py when the toolchain is unavailable.  Feeding the jitted
embed pipeline from this pool is what lifts host decode off the
critical path (SURVEY.md §7 "host I/O throughput").
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Sequence

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libemr2a_decode.so"
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-s", "-C", str(_NATIVE_DIR)],
                       check=True, capture_output=True, text=True)
        return _LIB_PATH.exists()
    except Exception as e:
        logger.warning("native decode pool build failed: %s", e)
        return False


def get_lib():
    """The loaded shared library, building it on demand; None if the
    native path is unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists() and not _build():
        _build_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.emr2a_decode_batch.restype = ctypes.c_int
        lib.emr2a_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
        _lib = lib
        return _lib
    except OSError as e:
        logger.warning("failed to load native decode pool: %s", e)
        _build_failed = True
        return None


def native_available() -> bool:
    return get_lib() is not None


def decode_batch(paths: Sequence, out_h: int, out_w: int,
                 n_threads: int = 0) -> tuple:
    """Decode+resize paths into one (n, out_h, out_w, 3) uint8 batch.

    Returns (batch, ok_mask); failed files have ok=False and zeroed
    rows (the skip-and-continue contract).  Raises RuntimeError when
    the native library is unavailable — callers use
    ``native_available()`` to pick the fallback.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decode pool unavailable")
    n = len(paths)
    out = np.zeros((n, out_h, out_w, 3), dtype=np.uint8)
    ok = np.zeros(n, dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(
        *[str(p).encode("utf-8") for p in paths])
    lib.emr2a_decode_batch(
        c_paths, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_h, out_w, n_threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out, ok.astype(bool)


def load_images_batch(paths: Sequence, size: int,
                      n_threads: int = 0) -> tuple:
    """Native-or-fallback batch loader producing a (n, size, size, 3)
    uint8 array + validity mask."""
    if native_available():
        return decode_batch(paths, size, size, n_threads)
    from emr2a_tpu.data.images import load_image_rgb, resize_to
    n = len(paths)
    out = np.zeros((n, size, size, 3), dtype=np.uint8)
    ok = np.zeros(n, dtype=bool)
    for i, p in enumerate(paths):
        arr = load_image_rgb(p)
        if arr is not None:
            out[i] = resize_to(arr, size, shortest_edge=False)
            ok[i] = True
    return out, ok
