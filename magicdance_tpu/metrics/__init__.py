from magicdance_tpu.metrics.core import (
    frechet_distance,
    l1_error,
    mae,
    psnr,
    ssim,
)
