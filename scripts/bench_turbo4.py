"""Turbo round 4: uncond pass gets its own DeepCache."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import jax, jax.numpy as jnp
from magicdance_tpu.config import ModelConfig, SampleConfig
from magicdance_tpu.pipeline import MagicPosePipeline

FRAMES, STEPS, SIZE = 32, 50, 512
cfg = ModelConfig()
pipe = MagicPosePipeline(cfg)
pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, zeros=True)
pipe.cast_model_params(jnp.bfloat16)
pose = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, SIZE, SIZE, 3))
ref = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 2 - 1

variants = {
    "all4_s3_uncond_dc": SampleConfig(steps=STEPS, cfg_scale=7.0,
                                      deepcache_every=3, pose_every=3,
                                      uncond_every=2,
                                      cfg_interval=(0.15, 0.85)),
}
for name, scfg in variants.items():
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg)
    _ = float(jnp.mean(out))
    compile_s = time.time() - t0
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(4), pose, ref, scfg)
    _ = float(jnp.mean(out))
    run_s = time.time() - t0
    print(json.dumps({"variant": name, "fps": round(FRAMES / run_s, 3),
                      "s_per_frame": round(run_s / FRAMES, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
