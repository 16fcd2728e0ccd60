"""Video-mode serving bench: temporal UNet + overlap-window sampling.

F=24 frames, window 16 / stride 12 (the reference's AnimateDiff scheme) =
2 windows x 16 = 32 UNet rows per step — same step batch as the B=32
image-mode headline, so the delta is the motion-module + scatter-average
cost.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magicdance_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
import json, time
import jax, jax.numpy as jnp
from magicdance_tpu.config import ModelConfig, ModelVariant, SampleConfig, UNetConfig
from magicdance_tpu.pipeline import MagicPosePipeline

FRAMES, STEPS, SIZE = 24, 50, 512
cfg = ModelConfig(variant=ModelVariant.APPEARANCE_POSE_TEMPORAL,
                  unet=UNetConfig(use_motion_modules=True))
pipe = MagicPosePipeline(cfg)
t0 = time.time()
pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, zeros=True)
pipe.cast_model_params(jnp.bfloat16)
print(f"init {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
pose = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, SIZE, SIZE, 3))
ref = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 2 - 1
variants = {
    "video_f24_w16_s12": SampleConfig(steps=STEPS, cfg_scale=7.0,
                                      window=16, stride=12),
    "video_turbo": SampleConfig(steps=STEPS, cfg_scale=7.0, window=16,
                                stride=12, uncond_every=2,
                                cfg_interval=(0.15, 0.85), bank_every=3),
    "video_turbo_ds2": SampleConfig(steps=STEPS, cfg_scale=7.0, window=16,
                                    stride=12, uncond_every=2,
                                    cfg_interval=(0.15, 0.85), bank_every=3,
                                    bank_downsample=2),
    # round 4: + self-KV token reduction at the ds1 spatial sites (main UNet
    # cond+uncond and pose CN) — attacks the 145+95 ms/step of ds1
    # attention kernels in the video step profile
    "video_turbo_selfkv": SampleConfig(steps=STEPS, cfg_scale=7.0, window=16,
                                       stride=12, uncond_every=2,
                                       cfg_interval=(0.15, 0.85), bank_every=3,
                                       bank_downsample=2,
                                       self_kv_downsample=2),
    "video_exact_selfkv": SampleConfig(steps=STEPS, cfg_scale=7.0, window=16,
                                       stride=12, self_kv_downsample=2),
    # round 5: pose_every/deepcache_every now legal in the video sampler
    # (per-absolute-frame caches survive window rotation, sampling/overlap.py)
    "video_turbo_full": SampleConfig(steps=STEPS, cfg_scale=7.0, window=16,
                                     stride=12, uncond_every=2,
                                     cfg_interval=(0.15, 0.85), bank_every=3,
                                     bank_downsample=2, self_kv_downsample=2,
                                     pose_every=3, deepcache_every=3),
    "video_turbo_full25": SampleConfig(steps=25, cfg_scale=7.0, window=16,
                                       stride=12, uncond_every=2,
                                       cfg_interval=(0.15, 0.85), bank_every=3,
                                       bank_downsample=2,
                                       self_kv_downsample=2,
                                       pose_every=3, deepcache_every=3),
    # round 5b: the image path's winning "combo" levers applied to video
    "video_max": SampleConfig(steps=STEPS, cfg_scale=7.0, window=16,
                              stride=12, uncond_every=4,
                              cfg_interval=(0.15, 0.85), bank_every=8,
                              bank_downsample=4, self_kv_downsample=4,
                              pose_every=5, deepcache_every=5,
                              reuse_exact_first=2, reuse_exact_last=2),
    "video_max25": SampleConfig(steps=25, cfg_scale=7.0, window=16,
                                stride=12, uncond_every=4,
                                cfg_interval=(0.15, 0.85), bank_every=8,
                                bank_downsample=4, self_kv_downsample=4,
                                pose_every=5, deepcache_every=5,
                                reuse_exact_first=2, reuse_exact_last=2),
}
_sel = os.environ.get("VARIANTS")
if _sel:
    variants = {k: variants[k] for k in _sel.split(",")}
for name, scfg in variants.items():
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg,
                             video=True)
    _ = float(jnp.mean(out))
    compile_s = time.time() - t0
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(4), pose, ref, scfg,
                             video=True)
    _ = float(jnp.mean(out))
    run_s = time.time() - t0
    print(json.dumps({"variant": name,
                      "fps": round(FRAMES / run_s, 3),
                      "s_per_frame": round(run_s / FRAMES, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
