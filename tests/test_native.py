"""Native C++ image-loading core tests (skipped when not buildable)."""

import os

import numpy as np
import pytest
from PIL import Image

from magicdance_tpu.data.native import batch_load_images, native_available


@pytest.fixture()
def image_files(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i, ext in enumerate(("jpg", "png", "jpg")):
        y, x = np.mgrid[0:60, 0:80]
        img = np.stack([(x * 3) % 256, (y * 4) % 256, (x + y) % 256], -1)
        img = (img + rng.randint(0, 10, img.shape)).clip(0, 255).astype(np.uint8)
        p = tmp_path / f"{i}.{ext}"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    return paths


def test_fallback_loader(image_files, monkeypatch):
    import magicdance_tpu.data.native as nat

    monkeypatch.setattr(nat, "_LIB", None)
    monkeypatch.setattr(nat, "_TRIED", True)
    out = batch_load_images(image_files, 32)
    assert out.shape == (3, 32, 32, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_native_loader_matches_pil(image_files):
    if not native_available():
        pytest.skip("native lib not built")
    out = batch_load_images(image_files, 32)
    assert out.shape == (3, 32, 32, 3)

    import magicdance_tpu.data.native as nat

    lib = nat._LIB
    try:
        nat._LIB = None
        ref = batch_load_images(image_files, 32)
    finally:
        nat._LIB = lib
    # PIL uses bicubic/area filters; allow interpolation differences
    assert float(np.abs(out - ref).mean()) < 0.05


def test_native_loader_hint_range(image_files):
    if not native_available():
        pytest.skip("native lib not built")
    out = batch_load_images(image_files, 16, scale=1.0 / 255.0, offset=0.0)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_native_loader_missing_file(image_files):
    if not native_available():
        pytest.skip("native lib not built")
    with pytest.raises(IOError):
        batch_load_images(image_files + ["/nonexistent/x.jpg"], 16)
