"""Round-5 second turbo sweep: beyond turbo_max.

Variants pair with their own same-steps exact baseline for PSNR (DDIM-20
rows compare against exact-20, not exact-25). Measures fps at B=32 and
PSNR at B=8 like scripts/bench_turbo5.py.

Usage: python scripts/bench_turbo6.py [VARIANTS=...]
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

from magicdance_tpu.config import ModelConfig, SampleConfig
from magicdance_tpu.pipeline import MagicPosePipeline

FRAMES = int(os.environ.get("FRAMES", "32"))
QB = int(os.environ.get("QB", "8"))
SIZE = 512

MAX = dict(deepcache_every=4, pose_every=4, uncond_every=3,
           cfg_interval=(0.15, 0.85), bank_every=5,
           bank_downsample=2, bank_downsample_min_seq=1024,
           self_kv_downsample=2, self_kv_min_seq=1024,
           reuse_exact_first=2, reuse_exact_last=2)

# (name, scfg, baseline-name or None if this IS a baseline)
VARIANTS = [
    ("exact25", SampleConfig(steps=25, cfg_scale=7.0), None),
    ("max25", SampleConfig(steps=25, cfg_scale=7.0, **MAX), "exact25"),
    ("umax25", SampleConfig(  # strides 5/5/4, bank 8
        steps=25, cfg_scale=7.0,
        **{**MAX, "deepcache_every": 5, "pose_every": 5,
           "uncond_every": 4, "bank_every": 8}), "exact25"),
    ("ds4_25", SampleConfig(  # 4x4 KV pooling at the big sites
        steps=25, cfg_scale=7.0,
        **{**MAX, "bank_downsample": 4, "self_kv_downsample": 4,
           "bank_downsample_min_seq": 4096, "self_kv_min_seq": 4096}),
     "exact25"),
    ("combo25", SampleConfig(  # umax strides + 4x4 pooling
        steps=25, cfg_scale=7.0,
        **{**MAX, "deepcache_every": 5, "pose_every": 5,
           "uncond_every": 4, "bank_every": 8,
           "bank_downsample": 4, "self_kv_downsample": 4,
           "bank_downsample_min_seq": 4096, "self_kv_min_seq": 4096}),
     "exact25"),
    ("exact20", SampleConfig(steps=20, cfg_scale=7.0), None),
    ("max20", SampleConfig(steps=20, cfg_scale=7.0, **MAX), "exact20"),
    ("combo20", SampleConfig(
        steps=20, cfg_scale=7.0,
        **{**MAX, "deepcache_every": 5, "pose_every": 5,
           "uncond_every": 4, "bank_every": 8,
           "bank_downsample": 4, "self_kv_downsample": 4,
           "bank_downsample_min_seq": 4096, "self_kv_min_seq": 4096}),
     "exact20"),
]
keep = os.environ.get("VARIANTS")
if keep:
    names = set(keep.split(","))
    needed = {b for n, _, b in VARIANTS if n in names and b}
    VARIANTS = [(n, s, b) for n, s, b in VARIANTS
                if n in names or n in needed]

cfg = ModelConfig()
pipe = MagicPosePipeline(cfg)
t0 = time.time()
pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, scale=0.02)
pipe.cast_model_params(jnp.bfloat16)
print(f"init {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

pose = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, SIZE, SIZE, 3))
ref = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 2 - 1


def to_u8(x):
    return np.clip((np.asarray(x) + 1.0) * 127.5, 0, 255).astype(np.uint8)


baselines = {}
for name, scfg, base in VARIANTS:
    rec = {"variant": name, "steps": scfg.steps}
    try:
        u8 = to_u8(pipe.sample_frames(jax.random.PRNGKey(3), pose[:QB], ref,
                                      scfg))
        if base is None:
            baselines[name] = u8
        elif base in baselines:
            a = u8.astype(np.float64) / 255.0
            b = baselines[base].astype(np.float64) / 255.0
            mse = float(np.mean((a - b) ** 2))
            rec[f"psnr_vs_{base}"] = round(
                99.0 if mse == 0 else -10.0 * np.log10(mse), 2)
        t0 = time.time()
        out = pipe.sample_frames(jax.random.PRNGKey(4), pose, ref, scfg)
        _ = float(jnp.mean(out))
        rec["compile_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        out = pipe.sample_frames(jax.random.PRNGKey(5), pose, ref, scfg)
        _ = float(jnp.mean(out))
        rec["fps_b32"] = round(FRAMES / (time.time() - t0), 4)
    except Exception as e:
        rec["error"] = repr(e)[:200]
    print(json.dumps(rec), flush=True)
