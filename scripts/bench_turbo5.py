"""Round-5 turbo lever sweep at DDIM-25 (the turbo_max operating point).

Measures, per variant: frames/sec at B=32 (the serving batch) and PSNR vs
the same-steps exact trajectory at B=8 (the quality probe harness of
scripts/bench_turbo_quality.py — random full-scale weights, u8-quantized
PSNR; fps and quality share one init since TPU runtime is
data-independent).

Levers from VERDICT r4 item 2: bank_every=5 (the bank input is CONSTANT
under wonoise), self_kv/bank downsampling extended to the S=1024 sites,
and trajectory-scheduled strides (aggressive mid-range, exact endpoints
via reuse_exact_first/_last).

Usage: python scripts/bench_turbo5.py  [VARIANTS=...] [FRAMES=32] [QB=8]
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
STEPS = 25

STACK = dict(deepcache_every=3, pose_every=3, uncond_every=2,
             cfg_interval=(0.15, 0.85), bank_every=3,
             bank_downsample=2, self_kv_downsample=2)

VARIANTS = {
    "exact25": SampleConfig(steps=STEPS, cfg_scale=7.0),
    "stack25": SampleConfig(steps=STEPS, cfg_scale=7.0, **STACK),
    "stack25_bank5": SampleConfig(steps=STEPS, cfg_scale=7.0,
                                  **{**STACK, "bank_every": 5}),
    "stack25_kv1024": SampleConfig(
        steps=STEPS, cfg_scale=7.0, **STACK,
        self_kv_min_seq=1024, bank_downsample_min_seq=1024),
    "stack25_endpoints45": SampleConfig(
        steps=STEPS, cfg_scale=7.0,
        **{**STACK, "deepcache_every": 4, "pose_every": 4,
           "uncond_every": 3, "bank_every": 5},
        reuse_exact_first=2, reuse_exact_last=2),
    "stack25_max": SampleConfig(
        steps=STEPS, cfg_scale=7.0,
        **{**STACK, "deepcache_every": 4, "pose_every": 4,
           "uncond_every": 3, "bank_every": 5},
        self_kv_min_seq=1024, bank_downsample_min_seq=1024,
        reuse_exact_first=2, reuse_exact_last=2),
}
keep = os.environ.get("VARIANTS")
if keep:
    names = ["exact25"] + [v for v in keep.split(",") if v != "exact25"]
    VARIANTS = {k: VARIANTS[k] for k in names}

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


exact_u8 = None
for name, scfg in VARIANTS.items():
    rec = {"variant": name, "steps": STEPS}
    try:
        # quality at B=8 first (also warms part of the cache)
        u8 = to_u8(pipe.sample_frames(jax.random.PRNGKey(3), pose[:QB], ref,
                                      scfg))
        if name == "exact25":
            exact_u8 = u8
        else:
            a = u8.astype(np.float64) / 255.0
            b = exact_u8.astype(np.float64) / 255.0
            mse = float(np.mean((a - b) ** 2))
            rec["psnr_vs_exact25"] = round(
                99.0 if mse == 0 else -10.0 * np.log10(mse), 2)
        # fps at B=32
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
