"""ctypes bindings for the native data-loading core (native/image_core.cpp).

Optional fast path for host-side image loading: C++ JPEG/PNG decode +
crop/resize/normalize with a thread pool, bypassing the Python GIL.
Builds on demand (`make -C native`); PIL fallback otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libmdimage.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.md_batch_load.restype = ctypes.c_int
        lib.md_batch_load.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def batch_load_images(
    paths: list[str],
    size: int,
    center_crop: bool = True,
    scale: float = 1.0 / 127.5,
    offset: float = -1.0,
) -> np.ndarray:
    """Decode+crop+resize+normalize a batch → (N, size, size, 3) float32.

    Default normalization maps uint8 → [-1, 1] (model range); use
    scale=1/255, offset=0 for pose-hint range.
    """
    lib = _load()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = lib.md_batch_load(
            arr, n, size, 1 if center_crop else 0,
            ctypes.c_float(scale), ctypes.c_float(offset),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if failures:
            raise IOError(f"native loader failed on {failures}/{n} images")
        return out
    # PIL fallback
    from PIL import Image

    from magicdance_tpu.data.transforms import center_crop_square, resize

    for i, p in enumerate(paths):
        img = np.asarray(Image.open(p).convert("RGB"))
        if center_crop:
            img = center_crop_square(img)
        out[i] = resize(img, size).astype(np.float32) * scale + offset
    return out
