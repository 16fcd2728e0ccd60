"""Stage-3 (motion-module) train-step bench: temporal UNet at F frames.

Measures the MOTION_ONLY regime the reference half-ships (temporal YAMLs
referenced by train_tiktok.py:847-956 were never released): one clip of F
frames per device step, frames folded into the batch axis, only the
AnimateDiff-style temporal transformers trainable.

Usage: python scripts/bench_train_video.py  [F_LIST=16,8] [SIZE=512]
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

from magicdance_tpu.config import (
    FreezeRegime,
    ModelConfig,
    ModelVariant,
    TrainConfig,
    UNetConfig,
)
from magicdance_tpu.models import AutoencoderKL, CLIPTextEncoder, MagicPoseModel
from magicdance_tpu.pipeline import MagicPosePipeline
from magicdance_tpu.train.trainer import Trainer

SIZE = int(os.environ.get("SIZE", "512"))
F_LIST = [int(f) for f in os.environ.get("F_LIST", "16,8").split(",")]
FROZEN_DTYPE = os.environ.get("FROZEN_DTYPE", "bfloat16")
PEAK_TFLOPS = 197e12  # v5e bf16

model_cfg = ModelConfig(variant=ModelVariant.APPEARANCE_POSE_TEMPORAL,
                        unet=UNetConfig(use_motion_modules=True))
pipe = MagicPosePipeline(model_cfg)
pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, scale=0.02)
params = jax.device_get(pipe.params)  # keep the f32 source tree on HOST
pipe.params = None

model = MagicPoseModel(model_cfg)
vae = AutoencoderKL(model_cfg.vae)
clip = CLIPTextEncoder(model_cfg.clip)

for F in F_LIST:
    from magicdance_tpu.config import OptimConfig
    cfg = TrainConfig(model=model_cfg, freeze=FreezeRegime.MOTION_ONLY,
                      batch_size_per_device=1, image_size=SIZE,
                      video_frames=F,
                      optim=OptimConfig(frozen_dtype=FROZEN_DTYPE))
    trainer = Trainer(cfg, model, vae, clip)
    state = trainer.create_state(params["model"], params["vae"],
                                 params["clip"])
    n_train = sum(int(np.prod(p.shape))
                  for p in jax.tree.leaves(state.train_params))
    batch = {
        "image": jnp.zeros((F, SIZE, SIZE, 3)),
        "reference": jnp.zeros((1, SIZE, SIZE, 3)),
        "pose": jnp.zeros((F, SIZE, SIZE, 3)),
        "input_ids": jnp.zeros((F, model_cfg.clip.max_length), jnp.int32),
    }
    try:
        step = trainer.jitted_step(state, batch)
        t0 = time.time()
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])  # scalar sync through the relay
        compile_s = time.time() - t0
        times = []
        for it in range(2):
            t0 = time.time()
            new_state, metrics = step(new_state, batch,
                                      jax.random.PRNGKey(2 + it))
            loss = float(metrics["loss"])
            times.append(time.time() - t0)
        step_s = min(times)
        try:
            ca = step.lower(state, batch, jax.random.PRNGKey(1)) \
                .compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", float("nan")))
        except Exception:
            flops = float("nan")
        mfu = flops / step_s / PEAK_TFLOPS if flops == flops else None
        print(json.dumps({
            "frames_per_clip": F, "frozen_dtype": FROZEN_DTYPE, "regime": "motion_only",
            "step_s": round(step_s, 2),
            "frames_per_sec": round(F / step_s, 3),
            "compile_s": round(compile_s, 1),
            "loss": round(loss, 4),
            "train_params_M": round(n_train / 1e6, 1),
            "tflops_per_step": (round(flops / 1e12, 1)
                                if flops == flops else None),
            "mfu_pct": round(mfu * 100, 1) if mfu else None,
        }), flush=True)
    except Exception as e:
        # full text: the axon compile-helper's stderr rides in the HTTP 500
        # body and the failure reason (e.g. OOM-kill) is at the END of it
        print(json.dumps({"frames_per_clip": F, "frozen_dtype": FROZEN_DTYPE, "error": repr(e)[:12000]}),
              flush=True)
    # free EVERYTHING device-resident before the next F: new_state/metrics
    # from the measured steps hold a full ~11 GB train state — leaking them
    # OOMed the next leg's create_state (round-4 r4d run, F=8 after F=16)
    state = new_state = metrics = step = None
    trainer._jit_step = None
