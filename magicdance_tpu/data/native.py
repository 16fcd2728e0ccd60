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
_HAS_RRC = False
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _needs_build(so: str) -> bool:
    if not os.path.exists(so):
        return True
    src = os.path.join(os.path.dirname(so), "image_core.cpp")
    try:
        return os.path.getmtime(src) > os.path.getmtime(so)
    except OSError:
        return False


def _build(so: str) -> None:
    """Run `make` under an exclusive lock so concurrent processes (multi-
    process DP training, parallel pytest) never rewrite the .so while a
    sibling dlopens it. Re-checks staleness after acquiring the lock."""
    import fcntl

    native_dir = os.path.dirname(so)
    with open(os.path.join(native_dir, ".build.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if _needs_build(so):
            subprocess.run(["make", "-C", native_dir],
                           check=True, capture_output=True, timeout=120)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _HAS_RRC, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libmdimage.so"))
    if _needs_build(so):
        try:
            _build(so)
        except Exception:
            if not os.path.exists(so):
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
    except (OSError, AttributeError):
        _LIB = None
        return None
    try:
        # bound separately: a prebuilt .so from before this entry point
        # (make unavailable to rebuild) must not disable the basic loader
        lib.md_batch_load_rrc.restype = ctypes.c_int
        lib.md_batch_load_rrc.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        _HAS_RRC = True
    except AttributeError:
        _HAS_RRC = False
    return _LIB


def native_available() -> bool:
    """True when the native batch loader is loaded (basic decode path)."""
    return _load() is not None


def native_rrc_available() -> bool:
    """True when the seeded-RRC training path is native too. A prebuilt .so
    from before md_batch_load_rrc (with make unavailable to rebuild) keeps
    the basic loader native while this returns False."""
    return _load() is not None and _HAS_RRC


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


def _splitmix64(state: int):
    state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return state, (z ^ (z >> 31)) & 0xFFFFFFFFFFFFFFFF


def rrc_params(seed: int, h: int, w: int,
               scale: tuple[float, float]) -> tuple[int, int, int]:
    """Exact Python replica of the C++ seeded random-resized-crop parameter
    derivation (md_batch_load_rrc): returns (top, left, side). Same seed +
    same dims == same crop — used by tests and by the PIL fallback."""
    s = seed & 0xFFFFFFFFFFFFFFFF

    def uniform(st):
        st, z = _splitmix64(st)
        return st, (z >> 40) / 16777216.0

    s, u = uniform(s)
    # the C++ receives the bounds as c_float: truncate to float32 and form
    # the difference in float32 exactly as `scale_lo + (scale_hi - scale_lo)
    # * u` does, else area_frac differs by ~1e-8 and side can differ by 1
    # when sqrt lands near an x.5 rounding boundary
    lo = float(np.float32(scale[0]))
    diff = float(np.float32(np.float32(scale[1]) - np.float32(scale[0])))
    area_frac = lo + diff * u
    # std::lround semantics (round half away from zero) — Python's round()
    # rounds half to even and would diverge at exact .5 boundaries
    side = int(np.floor(np.sqrt(area_frac * h * w) + 0.5))
    side = max(1, min(side, min(h, w)))
    s, u = uniform(s)
    top = min(int(u * (h - side + 1)), h - side)
    s, u = uniform(s)
    left = min(int(u * (w - side + 1)), w - side)
    return top, left, side


def batch_load_images_rrc(
    paths: list[str],
    size: int,
    seeds: list[int],
    scale_range: tuple[float, float] = (0.9, 1.0),
    scale: float = 1.0 / 127.5,
    offset: float = -1.0,
) -> np.ndarray:
    """Decode + seeded RandomResizedCrop + resize + normalize a batch →
    (N, size, size, 3) float32. Training-path twin of `batch_load_images`:
    passing one sample's seed for both its target frame and pose map yields
    the identical crop (the reference's shared-transform-per-sample
    semantics, tiktok_video_arnold_copy.py:60-80)."""
    lib = _load()
    n = len(paths)
    assert len(seeds) == n
    out = np.empty((n, size, size, 3), np.float32)
    if lib is not None and _HAS_RRC:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        seed_arr = (ctypes.c_longlong * n)(*[int(s) & 0x7FFFFFFFFFFFFFFF
                                             for s in seeds])
        failures = lib.md_batch_load_rrc(
            arr, n, size, seed_arr,
            ctypes.c_float(scale_range[0]), ctypes.c_float(scale_range[1]),
            ctypes.c_float(scale), ctypes.c_float(offset),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if failures:
            raise IOError(f"native loader failed on {failures}/{n} images")
        return out
    # PIL fallback: same crop params via the replica RNG; bilinear resize to
    # match the native core's resize_crop_bilinear as closely as PIL can
    from PIL import Image

    from magicdance_tpu.data.transforms import resize

    for i, p in enumerate(paths):
        img = np.asarray(Image.open(p).convert("RGB"))
        h, w = img.shape[:2]
        top, left, side = rrc_params(int(seeds[i]) & 0x7FFFFFFFFFFFFFFF,
                                     h, w, scale_range)
        crop = img[top:top + side, left:left + side]
        out[i] = (resize(crop, size, method=Image.BILINEAR).astype(np.float32)
                  * scale + offset)
    return out
