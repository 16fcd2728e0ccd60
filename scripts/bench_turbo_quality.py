"""Turbo-mode quality validation: stride x (speedup, PSNR/SSIM vs exact).

No reference/SD checkpoints are obtainable in this environment (zero
egress), so this measures turbo-vs-EXACT output deltas on a fixed seed with
random full-scale weights — the structural approximation error of each
turbo mode (cached uncond / guidance interval / pose reuse / DeepCache)
relative to the exact trajectory, decoded to pixels. Caveat recorded in
BENCH.md: random weights lack the temporal smoothness trained nets have, so
these deltas are PESSIMISTIC bounds for DeepCache/uncond reuse (both exploit
smoothness of trajectories in t).

Usage: python scripts/bench_turbo_quality.py
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

FRAMES = int(os.environ.get("FRAMES", "8"))
STEPS, SIZE = 50, 512

cfg = ModelConfig()
pipe = MagicPosePipeline(cfg)
pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, scale=0.02)
pipe.cast_model_params(jnp.bfloat16)
pose = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, SIZE, SIZE, 3))
ref = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 2 - 1

variants = {
    "exact": SampleConfig(steps=STEPS, cfg_scale=7.0),
    "cfg_interval": SampleConfig(steps=STEPS, cfg_scale=7.0,
                                 cfg_interval=(0.15, 0.85)),
    "uncond_every2": SampleConfig(steps=STEPS, cfg_scale=7.0, uncond_every=2),
    "pose_every2": SampleConfig(steps=STEPS, cfg_scale=7.0, pose_every=2),
    "deepcache2": SampleConfig(steps=STEPS, cfg_scale=7.0, deepcache_every=2),
    "all_stride2": SampleConfig(steps=STEPS, cfg_scale=7.0, deepcache_every=2,
                                pose_every=2, uncond_every=2,
                                cfg_interval=(0.15, 0.85)),
    "all_stride3": SampleConfig(steps=STEPS, cfg_scale=7.0, deepcache_every=3,
                                pose_every=3, uncond_every=2,
                                cfg_interval=(0.15, 0.85)),
    "bank3": SampleConfig(steps=STEPS, cfg_scale=7.0, bank_every=3),
    "all_stride3_bank3": SampleConfig(steps=STEPS, cfg_scale=7.0,
                                      deepcache_every=3, pose_every=3,
                                      uncond_every=2,
                                      cfg_interval=(0.15, 0.85),
                                      bank_every=3),
    # bank-KV spatial downsample (round-3): pool the 5 ds-1 bank entries 2x2
    # before the read sites — attacks the single largest attention bucket
    "bank_ds2": SampleConfig(steps=STEPS, cfg_scale=7.0, bank_downsample=2),
    "bank_ds2_min1024": SampleConfig(steps=STEPS, cfg_scale=7.0,
                                     bank_downsample=2,
                                     bank_downsample_min_seq=1024),
    "all_stride3_bank3_ds2": SampleConfig(steps=STEPS, cfg_scale=7.0,
                                          deepcache_every=3, pose_every=3,
                                          uncond_every=2,
                                          cfg_interval=(0.15, 0.85),
                                          bank_every=3, bank_downsample=2),
    # round 4: self-KV token reduction (queries/outputs full res; SELF K/V
    # 2x2 pooled at the 5 ds-1 sites of the main UNet + pose CN)
    "self_kv2": SampleConfig(steps=STEPS, cfg_scale=7.0, self_kv_downsample=2),
    "full_stack_r4": SampleConfig(steps=STEPS, cfg_scale=7.0,
                                  deepcache_every=3, pose_every=3,
                                  uncond_every=2, cfg_interval=(0.15, 0.85),
                                  bank_every=3, bank_downsample=2,
                                  self_kv_downsample=2),
    # steps-vs-quality row: the standard DDIM-25 tradeoff every SD user
    # already accepts (quality delta here is vs the DDIM-50 exact
    # trajectory, so it bounds the schedule truncation error on this probe)
    "ddim25": SampleConfig(steps=25, cfg_scale=7.0),
    "ddim25_full_stack": SampleConfig(steps=25, cfg_scale=7.0,
                                      deepcache_every=3, pose_every=3,
                                      uncond_every=2,
                                      cfg_interval=(0.15, 0.85),
                                      bank_every=3, bank_downsample=2,
                                      self_kv_downsample=2),
}
# optional subset: VARIANTS=exact,bank3,... ("exact" always runs first for
# the comparison baseline)
_sel = os.environ.get("VARIANTS")
if _sel:
    keep = [v.strip() for v in _sel.split(",")]
    variants = {k: variants[k] for k in ["exact"] + [v for v in keep
                                                     if v != "exact"]}

exact_u8 = None
for name, scfg in variants.items():
    def to_u8(x):
        return np.clip((np.asarray(x) + 1.0) * 127.5, 0, 255).astype(np.uint8)

    t0 = time.time()
    u8 = to_u8(pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg))
    compile_s = time.time() - t0
    t0 = time.time()
    u8 = to_u8(pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg))
    run_s = time.time() - t0
    rec = {"variant": name, "fps": round(FRAMES / run_s, 3),
           "compile_s": round(compile_s, 1)}
    if name == "exact":
        exact_u8 = u8
        rec["psnr_vs_exact"] = None
        rec["ssim_vs_exact"] = None
    else:
        from magicdance_tpu.metrics.center import luma_uint8
        from magicdance_tpu.metrics.core import psnr, ssim

        a = jnp.asarray(u8, jnp.float32) / 255.0
        b = jnp.asarray(exact_u8, jnp.float32) / 255.0
        ga = jnp.asarray(luma_uint8(u8.astype(np.float32)),
                         jnp.float32)[..., None] / 255.0
        gb = jnp.asarray(luma_uint8(exact_u8.astype(np.float32)),
                         jnp.float32)[..., None] / 255.0
        rec["psnr_vs_exact"] = round(float(psnr(a, b)), 2)
        rec["ssim_vs_exact"] = round(float(ssim(ga, gb)), 4)
    print(json.dumps(rec), flush=True)
