"""Tests for host-side data pipeline pieces and metric math."""

import numpy as np
import pytest

from magicdance_tpu.data import transforms as T
from magicdance_tpu.data.mask import get_mask
from magicdance_tpu.data.pose import PoseResult, draw_pose, keypoint_quality
from magicdance_tpu.data.tokenizer import BOS, EOS, CLIPTokenizer, empty_prompt_ids


def test_center_crop_and_resize():
    img = np.zeros((100, 60, 3), np.uint8)
    sq = T.center_crop_square(img)
    assert sq.shape == (60, 60, 3)
    r = T.resize(sq, 32)
    assert r.shape == (32, 32, 3)


def test_remove_white_border():
    img = np.full((50, 50, 3), 255, np.uint8)
    img[10:40, 5:45] = 30
    out = T.remove_white_border(img)
    assert out.shape == (30, 40, 3)


def test_random_resized_crop_shared_params():
    rng = np.random.RandomState(0)
    a = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    ca, params = T.random_resized_crop(a, 32, rng)
    cb, _ = T.random_resized_crop(a, 32, rng, params=params)
    np.testing.assert_array_equal(ca, cb)


def test_value_ranges():
    img = np.array([[[0, 128, 255]]], np.uint8)
    m = T.to_model_range(img)
    assert m.min() >= -1.0 and m.max() <= 1.0
    back = T.from_model_range(m)
    np.testing.assert_allclose(back, img, atol=1)
    h = T.to_hint_range(img)
    assert h.max() <= 1.0


def test_monochrome_filter():
    assert T.is_monochrome(np.full((32, 32, 3), 77, np.uint8))
    assert not T.is_monochrome(
        np.random.RandomState(0).randint(0, 255, (32, 32, 3)).astype(np.uint8))


def test_draw_pose_renders():
    body = np.full((1, 18, 2), -1.0)
    # a simple vertical figure: nose, neck, shoulders
    body[0, 0] = [0.5, 0.2]
    body[0, 1] = [0.5, 0.35]
    body[0, 2] = [0.4, 0.35]
    body[0, 5] = [0.6, 0.35]
    pose = PoseResult(body=body)
    canvas = draw_pose(pose, 128, 128)
    assert canvas.shape == (128, 128, 3)
    assert canvas.sum() > 0, "skeleton not rendered"
    assert keypoint_quality(pose) == 4


def test_masks():
    rng = np.random.RandomState(0)
    for kind in ("bbox", "brush", "irregular", "random"):
        m = get_mask(64, 64, rng, kind)
        assert m.shape == (64, 64, 1)
        assert set(np.unique(m)).issubset({0.0, 1.0})
        assert m.sum() > 0


def test_tokenizer_empty_prompt():
    tok = CLIPTokenizer()
    ids = tok([""])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == BOS and ids[0, 1] == EOS and ids[0, -1] == EOS
    np.testing.assert_array_equal(ids, empty_prompt_ids(1))
    with pytest.raises(RuntimeError):
        tok(["a photo of a person"])


def test_metric_math():
    import jax.numpy as jnp

    from magicdance_tpu.metrics.core import (
        frechet_distance,
        gaussian_frechet_stats,
        l1_error,
        psnr,
        ssim,
    )

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    assert float(l1_error(a, a)) == 0.0
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    assert float(psnr(a, a)) > 100

    b = jnp.clip(a + 0.1, 0, 1)
    assert 0 < float(ssim(a, b)) < 1.0
    assert float(l1_error(a, b)) == pytest.approx(0.1, abs=0.02)

    f = rng.randn(500, 8)
    mu, s = gaussian_frechet_stats(f)
    assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-6)
    mu2, s2 = gaussian_frechet_stats(f + 5.0)
    d = frechet_distance(mu, s, mu2, s2)
    assert d == pytest.approx(8 * 25.0, rel=0.05)


def test_ssim_matches_skimage_if_available():
    try:
        from skimage.metrics import structural_similarity
    except ImportError:
        pytest.skip("skimage not available")
    import jax.numpy as jnp

    from magicdance_tpu.metrics.core import ssim

    rng = np.random.RandomState(1)
    a = rng.rand(48, 48, 3).astype(np.float32)
    b = np.clip(a + rng.randn(48, 48, 3).astype(np.float32) * 0.05, 0, 1)
    ref = structural_similarity(a, b, channel_axis=2, data_range=1.0)
    ours = float(ssim(jnp.asarray(a[None]), jnp.asarray(b[None])))
    assert ours == pytest.approx(ref, abs=2e-3)


def test_video_utils(tmp_path):
    from magicdance_tpu.utils.video import frames_to_gif, save_image_grid

    frames = [np.full((16, 16, 3), c, np.uint8) for c in (0, 128, 255)]
    gif = frames_to_gif(frames, str(tmp_path / "o.gif"), fps=5)
    assert (tmp_path / "o.gif").exists()
    grid = save_image_grid([frames, frames], str(tmp_path / "g.png"))
    assert (tmp_path / "g.png").exists()


def test_lpips_runs_uncalibrated():
    from magicdance_tpu.metrics.lpips import LPIPSScorer

    s = LPIPSScorer()
    a = np.zeros((1, 32, 32, 3), np.float32)
    b = np.ones((1, 32, 32, 3), np.float32)
    da = s(a, a)
    dab = s(a, b)
    assert da.shape == (1,)
    assert float(da[0]) == pytest.approx(0.0, abs=1e-5)
    # random (uncalibrated) lin weights may produce either sign; identical
    # inputs must still be exactly 0 while different inputs are not
    assert float(dab[0]) != 0.0 and np.isfinite(dab).all()


def _ssim_oracle(a8: np.ndarray, b8: np.ndarray, data_range=255.0) -> float:
    """Independent fp64 implementation of skimage.metrics.structural_similarity
    defaults (uniform 7x7 window, sample covariance, crop pad, K1/K2 .01/.03)
    using scipy — the exact path DisCo's SSIM takes on grayscale uint8 images
    (ref ssim_l1_lpips_psnr.py:62-67). skimage itself is absent from this
    environment, so the algorithm is pinned by this from-spec oracle."""
    from scipy.ndimage import uniform_filter

    win, pad = 7, 3
    NP = win * win
    cov_norm = NP / (NP - 1)
    a = a8.astype(np.float64)
    b = b8.astype(np.float64)
    ux, uy = uniform_filter(a, win), uniform_filter(b, win)
    uxx, uyy = uniform_filter(a * a, win), uniform_filter(b * b, win)
    uxy = uniform_filter(a * b, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    return float(S[pad:-pad, pad:-pad].mean())


def test_ssim_golden_vs_scipy_oracle():
    """Pin our JAX SSIM to the skimage algorithm on DisCo's exact input
    convention (grayscale uint8). SSIM is invariant to common rescaling of
    inputs and data_range, so [0,1]-input/range-1 must equal uint8/range-255."""
    import jax.numpy as jnp

    from magicdance_tpu.metrics.center import luma_uint8
    from magicdance_tpu.metrics.core import ssim

    rng = np.random.RandomState(7)
    base = np.clip(rng.rand(64, 64, 3) * 160 + 40
                   + rng.randn(64, 64, 3) * 20, 0, 255).astype(np.uint8)
    noisy = np.clip(base.astype(np.int32)
                    + (rng.randn(64, 64, 3) * 12).astype(np.int32),
                    0, 255).astype(np.uint8)
    g1, g2 = luma_uint8(base), luma_uint8(noisy)
    ref = _ssim_oracle(g1, g2)
    ours = float(ssim(jnp.asarray(g1, jnp.float32)[None, ..., None] / 255.0,
                      jnp.asarray(g2, jnp.float32)[None, ..., None] / 255.0))
    assert ours == pytest.approx(ref, abs=1e-5)


def test_ssim_stats_pin_highest_precision():
    """The TPU backend's DEFAULT conv precision casts inputs to bf16; SSIM's
    `uxx - ux*ux` cancellation then goes negative on near-constant windows
    and per-pixel scores explode (observed: folder SSIM 1.26 > the
    mathematical bound 1.0 on the e2e run's near-constant gen images).
    CPU ignores the precision request, so the guard is structural: the
    window-statistics conv must carry HIGHEST precision, overriding any
    backend/context default."""
    import jax
    import jax.numpy as jnp

    from magicdance_tpu.metrics.core import _uniform_filter, ssim

    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    jaxpr = str(jax.make_jaxpr(lambda a: _uniform_filter(a, 7))(x))
    assert "HIGHEST" in jaxpr, jaxpr

    # and the bound holds on the exact failure shape: near-constant gen vs
    # structured gt (regardless of backend)
    rng = np.random.RandomState(0)
    gen = jnp.asarray(
        0.5 + rng.rand(1, 64, 64, 1) * 0.02, jnp.float32)
    gt = jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)
    v = float(ssim(gen, gt))
    assert -1.0 <= v <= 1.0, v


def test_paired_metrics_disco_conventions(tmp_path):
    """compute_paired_metrics reproduces the reference's formulas end-to-end:
    l1 = mean|a-b| / (H*W) on 0-255 (ssim_l1_lpips_psnr.py:31-34), psnr with
    255 peak (:12-19), ssim on grayscale via the oracle above."""
    from PIL import Image

    from magicdance_tpu.metrics.center import compute_paired_metrics, luma_uint8

    rng = np.random.RandomState(3)
    gen_dir, gt_dir = tmp_path / "gen", tmp_path / "gt"
    gen_dir.mkdir(); gt_dir.mkdir()
    gens, gts = [], []
    for i in range(3):
        a = np.clip(rng.rand(32, 32, 3) * 200 + 20
                    + rng.randn(32, 32, 3) * 15, 0, 255).astype(np.uint8)
        b = np.clip(a.astype(np.int32)
                    + (rng.randn(32, 32, 3) * 10).astype(np.int32),
                    0, 255).astype(np.uint8)
        Image.fromarray(a).save(gen_dir / f"{i:03d}.png")
        Image.fromarray(b).save(gt_dir / f"{i:03d}.png")
        gens.append(a); gts.append(b)

    out = compute_paired_metrics(str(gen_dir), str(gt_dir),
                                 ["l1", "mae", "ssim", "psnr"])
    assert out["num_images"] == 3

    ga = np.stack(gens).astype(np.float64)
    ta = np.stack(gts).astype(np.float64)
    # reference l1_eval: per-image err/(H*W), averaged
    l1_ref = np.mean([np.abs(g - t).mean() / (32 * 32)
                      for g, t in zip(ga, ta)])
    assert out["l1"] == pytest.approx(l1_ref, rel=1e-5)
    mae_ref = np.abs(ga / 255 - ta / 255).mean()
    assert out["mae"] == pytest.approx(mae_ref, rel=1e-4)
    # reference psnr_eval: 20*log10(255/sqrt(mse)) on 0-255 pixels
    mse = ((ga - ta) ** 2).mean()
    assert out["psnr"] == pytest.approx(20 * np.log10(255 / np.sqrt(mse)),
                                        rel=1e-4)
    ssim_ref = np.mean([_ssim_oracle(luma_uint8(g.astype(np.uint8)),
                                     luma_uint8(t.astype(np.uint8)))
                        for g, t in zip(np.stack(gens), np.stack(gts))])
    assert out["ssim"] == pytest.approx(ssim_ref, abs=1e-5)
