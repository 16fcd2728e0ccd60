"""Low-level metric math: L1/MAE, PSNR, SSIM, Frechet distance.

JAX rebuild of the DisCo metric suite's pure-math pieces
(ref: tool/metrics/ssim_l1_lpips_psnr.py:38 compute_ssim_l1_psnr — L1 on
[0,1] arrays, skimage-convention SSIM (7x7 uniform window, channel-averaged)
and PSNR; tool/cleanfid/fid.py frechet_distance). All functions are jittable
and batch-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def l1_error(a: jax.Array, b: jax.Array) -> jax.Array:
    """Plain mean absolute error over all pixels; inputs in [0, 1].
    (DisCo's reported 'L1' uses a different normalization — mean |a-b| on
    0-255 pixels divided by H*W, ref ssim_l1_lpips_psnr.py:31-34 — which
    metrics/center.py reproduces for the `l1` key; this function backs the
    `mae` key.)"""
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


mae = l1_error


def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio, per skimage convention."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jax.Array, win: int) -> jax.Array:
    """win x win mean filter, valid padding. x: (B, H, W, C).

    precision=HIGHEST is load-bearing: the TPU backend's DEFAULT conv
    precision casts inputs to bf16, and SSIM's `uxx - ux*ux` variance
    cancellation then goes negative on near-constant windows — observed as
    per-pixel SSIM values of +-1e4 and a folder score of 1.26 (> the
    mathematical bound of 1). Window statistics must be exact f32 on every
    backend."""
    k = jnp.ones((win, win, 1, 1), x.dtype) / (win * win)
    c = x.shape[-1]
    kern = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 1.0,
    win: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Structural similarity, skimage defaults (uniform 7x7 window, sample
    covariance normalization, channel-averaged). a/b: (B, H, W, C) in
    [0, data_range]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    C1 = (k1 * data_range) ** 2
    C2 = (k2 * data_range) ** 2
    NP = win * win
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(a, win)
    uy = _uniform_filter(b, win)
    uxx = _uniform_filter(a * a, win)
    uyy = _uniform_filter(b * b, win)
    uxy = _uniform_filter(a * b, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux**2 + uy**2 + C1) * (vx + vy + C2)
    )
    return jnp.mean(s)


def gaussian_frechet_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of a feature matrix (N, D)."""
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """FID/FVD core: ||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))
    (ref tool/cleanfid/fid.py frechet_distance; standard Heusel et al.)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def inception_score_from_logits(logits: np.ndarray, splits: int = 10) -> tuple[float, float]:
    """IS from class logits (N, 1000) (ref tool/inception_score.py)."""
    from scipy.stats import entropy

    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = probs / probs.sum(axis=1, keepdims=True)
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        py = part.mean(axis=0)
        scores.append(np.exp(np.mean([entropy(p, py) for p in part])))
    return float(np.mean(scores)), float(np.std(scores))
