"""Benchmark: denoised 512x512 frames/sec/chip at DDIM-50 (BASELINE.json).

Full MagicPose serving path on one TPU chip: per DDIM step one appearance
bank write (shared by the frame batch), per frame a pose-ControlNet forward,
a bank-read cond UNet forward, and a plain uncond UNet forward
(controlnet_important CFG, ref ddim.py:598-605), finished with VAE decode.
Prints ONE JSON line. vs_baseline is against the driver-set target of
8 frames/sec/chip (BASELINE.md "Rebuild targets").
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


FRAMES = int(__import__("os").environ.get("BENCH_FRAMES", "32"))
STEPS = int(__import__("os").environ.get("BENCH_STEPS", "50"))
SIZE = int(__import__("os").environ.get("BENCH_SIZE", "512"))
TARGET_FPS = 8.0


def main() -> None:
    from magicdance_tpu.config import ModelConfig, SampleConfig
    from magicdance_tpu.pipeline import MagicPosePipeline
    from magicdance_tpu.utils.testing import randomize_zero_kernels

    cfg = ModelConfig()  # flagship APPEARANCE_POSE, SD1.5 scale
    pipe = MagicPosePipeline(cfg)
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    pipe.fast_init_params(rng, image_size=SIZE, zeros=True)
    pipe.cast_model_params(jnp.bfloat16)
    init_s = time.time() - t0
    print(f"[bench] init done in {init_s:.1f}s", file=sys.stderr, flush=True)

    scfg = SampleConfig(steps=STEPS, cfg_scale=7.0)
    pose = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, SIZE, SIZE, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 2 - 1

    # compile + warmup (device_get forces real completion; block_until_ready
    # is unreliable over the axon relay)
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg)
    _sync = float(jax.numpy.mean(out))
    compile_s = time.time() - t0
    print(f"[bench] compile+warmup {compile_s:.1f}s", file=sys.stderr, flush=True)

    # steady-state measurement
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(4), pose, ref, scfg)
    _sync = float(jax.numpy.mean(out))
    run_s = time.time() - t0

    fps = FRAMES / run_s
    result = {
        "metric": f"{SIZE}x{SIZE} denoised frames/sec/chip @ DDIM-{STEPS} (CFG, appearance+pose)",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 4),
        "detail": {
            "frames_batch": FRAMES,
            "steps": STEPS,
            "seconds_per_frame": round(run_s / FRAMES, 3),
            "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
