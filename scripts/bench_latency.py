"""Single-frame (B=1) serving latency: exact vs turbo incl. bank_every.

At frame batch 1 the appearance-bank write (a full UNet-copy forward,
ref cldm.py:164-497) is no longer amortized across a batch — it is one of
the three UNet-scale forwards each step — so `bank_every` matters most
here. Run on the real chip: `python scripts/bench_latency.py`.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magicdance_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
import json, time
import jax, jax.numpy as jnp
from magicdance_tpu.config import ModelConfig, SampleConfig
from magicdance_tpu.pipeline import MagicPosePipeline

FRAMES = int(os.environ.get("BENCH_FRAMES", "1"))
STEPS, SIZE = 50, 512
cfg = ModelConfig()
pipe = MagicPosePipeline(cfg)
pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, zeros=True)
pipe.cast_model_params(jnp.bfloat16)
pose = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, SIZE, SIZE, 3))
ref = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 2 - 1

variants = {
    "exact": SampleConfig(steps=STEPS, cfg_scale=7.0),
    "bank2": SampleConfig(steps=STEPS, cfg_scale=7.0, bank_every=2),
    "bank3": SampleConfig(steps=STEPS, cfg_scale=7.0, bank_every=3),
    "turbo_s3": SampleConfig(steps=STEPS, cfg_scale=7.0, deepcache_every=3,
                             pose_every=3, uncond_every=2,
                             cfg_interval=(0.15, 0.85)),
    "turbo_s3_bank3": SampleConfig(steps=STEPS, cfg_scale=7.0,
                                   deepcache_every=3, pose_every=3,
                                   uncond_every=2, cfg_interval=(0.15, 0.85),
                                   bank_every=3),
    # round 5: the shipped turbo_max operating point (DDIM-20 combo)
    "turbo_max20": SampleConfig(steps=20, cfg_scale=7.0, deepcache_every=5,
                                pose_every=5, uncond_every=4,
                                cfg_interval=(0.15, 0.85), bank_every=8,
                                bank_downsample=4, self_kv_downsample=4,
                                reuse_exact_first=2, reuse_exact_last=2),
}
_sel = os.environ.get("VARIANTS")
if _sel:
    variants = {k: variants[k] for k in _sel.split(",")}
for name, scfg in variants.items():
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg)
    _ = float(jnp.mean(out))
    compile_s = time.time() - t0
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(4), pose, ref, scfg)
    _ = float(jnp.mean(out))
    run_s = time.time() - t0
    print(json.dumps({"variant": name, "frames": FRAMES,
                      "latency_s": round(run_s, 3),
                      "fps": round(FRAMES / run_s, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
