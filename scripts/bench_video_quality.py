"""Video turbo-mode quality probe: PSNR vs the exact overlap-sampling
trajectory, random full-scale weights (same caveat as
scripts/bench_turbo_quality.py — structural approximation error, not final
visual quality; re-run with converted weights when available).

F=24 so the window layout actually rotates (F > window) — the per-
absolute-frame caches (round 5) are exercised for real.

Usage: python scripts/bench_video_quality.py  [VARIANTS=...] [FRAMES=24]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magicdance_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from magicdance_tpu.config import (ModelConfig, ModelVariant, SampleConfig,
                                   UNetConfig)
from magicdance_tpu.pipeline import MagicPosePipeline

FRAMES = int(os.environ.get("FRAMES", "24"))
STEPS, SIZE = 50, 512

BASE = dict(steps=STEPS, cfg_scale=7.0, window=16, stride=12)
VARIANTS = {
    "exact": SampleConfig(**BASE),
    "turbo_r4": SampleConfig(**BASE, uncond_every=2,
                             cfg_interval=(0.15, 0.85), bank_every=3,
                             bank_downsample=2, self_kv_downsample=2),
    "pose3": SampleConfig(**BASE, pose_every=3),
    "deep3": SampleConfig(**BASE, deepcache_every=3),
    "turbo_full": SampleConfig(**BASE, uncond_every=2,
                               cfg_interval=(0.15, 0.85), bank_every=3,
                               bank_downsample=2, self_kv_downsample=2,
                               pose_every=3, deepcache_every=3),
    "video_max": SampleConfig(**BASE, uncond_every=4,
                              cfg_interval=(0.15, 0.85), bank_every=8,
                              bank_downsample=4, self_kv_downsample=4,
                              pose_every=5, deepcache_every=5,
                              reuse_exact_first=2, reuse_exact_last=2),
}
keep = os.environ.get("VARIANTS")
if keep:
    names = ["exact"] + [v for v in keep.split(",") if v != "exact"]
    VARIANTS = {k: VARIANTS[k] for k in names}

cfg = ModelConfig(variant=ModelVariant.APPEARANCE_POSE_TEMPORAL,
                  unet=UNetConfig(use_motion_modules=True))
pipe = MagicPosePipeline(cfg)
t0 = time.time()
pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, scale=0.02)
pipe.cast_model_params(jnp.bfloat16)
print(f"init {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

pose = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, SIZE, SIZE, 3))
ref = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 2 - 1


def to_u8(x):
    return np.clip((np.asarray(x) + 1.0) * 127.5, 0, 255).astype(np.uint8)


exact_u8 = None
for name, scfg in VARIANTS.items():
    rec = {"variant": name}
    try:
        t0 = time.time()
        out = pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg,
                                 video=True)
        u8 = to_u8(out)
        rec["compile_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        out = pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg,
                                 video=True)
        _ = float(jnp.mean(out))  # scalar sync; async dispatch lies
        rec["fps"] = round(FRAMES / (time.time() - t0), 3)
        if name == "exact":
            exact_u8 = u8
        else:
            a = u8.astype(np.float64) / 255.0
            b = exact_u8.astype(np.float64) / 255.0
            mse = float(np.mean((a - b) ** 2))
            rec["psnr_vs_exact"] = round(
                99.0 if mse == 0 else -10.0 * np.log10(mse), 2)
    except Exception as e:
        rec["error"] = repr(e)[:200]
    print(json.dumps(rec), flush=True)
