"""Profile the full-scale training step the way serving was profiled.

Measures on the real chip (stage-2-style 512² training):
  * per-batch-size step time + MFU (FLOPs from XLA's own cost analysis)
  * compile time
  * host input-pipeline throughput (native decode+RRC) vs step time —
    whether PrefetchLoader hides the data path
  * trainable-param bytes -> projected multi-chip gradient all-reduce cost

Usage: python scripts/bench_train.py  [BS_LIST=1,2,4,8] [REGIME=pose_only]
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
    TrainConfig,
)
from magicdance_tpu.models import AutoencoderKL, CLIPTextEncoder, MagicPoseModel
from magicdance_tpu.pipeline import MagicPosePipeline
from magicdance_tpu.train.trainer import Trainer

SIZE = 512
BS_LIST = [int(b) for b in os.environ.get("BS_LIST", "1,2,4,8").split(",")]
REGIME = FreezeRegime(os.environ.get("REGIME", "pose_only"))
# frozen-weight STORAGE dtype: "bfloat16" (default) or "int8"
# (weight-only quantized streaming A/B, magicdance_tpu/train/quant.py)
FROZEN_DTYPE = os.environ.get("FROZEN_DTYPE", "bfloat16")
PEAK_TFLOPS = 197e12  # v5e bf16


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0][(0,) * jax.tree.leaves(x)[0].ndim]))


def main():
    model_cfg = ModelConfig()
    pipe = MagicPosePipeline(model_cfg)
    pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, scale=0.02)
    # keep the ~10 GB f32 source tree on HOST only: it must never sit in
    # HBM next to a train state (that duplicate skews every measured bs,
    # not just the last one)
    params = jax.device_get(pipe.params)
    pipe.params = None

    model = MagicPoseModel(model_cfg)
    vae = AutoencoderKL(model_cfg.vae)
    clip = CLIPTextEncoder(model_cfg.clip)

    for bs in BS_LIST:
        # free the previous batch size's train state BEFORE creating the
        # next (round-5: bs=2's ~15 GB state still resident made bs=4
        # RESOURCE_EXHAUSTED at runtime; each bs alone fits fine)
        import gc as _gc
        state = new_state = step = None
        _gc.collect()
        from magicdance_tpu.config import OptimConfig
        cfg = TrainConfig(model=model_cfg, freeze=REGIME,
                          batch_size_per_device=bs, image_size=SIZE,
                          optim=OptimConfig(frozen_dtype=FROZEN_DTYPE))
        trainer = Trainer(cfg, model, vae, clip)
        state = trainer.create_state(params["model"], params["vae"],
                                     params["clip"])
        n_train = sum(int(np.prod(p.shape))
                      for p in jax.tree.leaves(state.train_params))
        batch = {
            "image": jnp.zeros((bs, SIZE, SIZE, 3)),
            "reference": jnp.zeros((bs, SIZE, SIZE, 3)),
            "pose": jnp.zeros((bs, SIZE, SIZE, 3)),
            "input_ids": jnp.zeros((bs, model_cfg.clip.max_length), jnp.int32),
        }
        try:
            step = trainer.jitted_step(state, batch)
            t0 = time.time()
            new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
            loss = float(metrics["loss"])
            compile_s = time.time() - t0
            # steady state
            times = []
            for it in range(2):
                t0 = time.time()
                new_state, metrics = step(new_state, batch,
                                          jax.random.PRNGKey(2 + it))
                loss = float(metrics["loss"])  # scalar sync through relay
                times.append(time.time() - t0)
            step_s = min(times)
            # FLOPs from the compiled executable
            try:
                ca = step.lower(state, batch, jax.random.PRNGKey(1)) \
                    .compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                flops = float(ca.get("flops", float("nan")))
            except Exception as e:
                flops = float("nan")
            mfu = flops / step_s / PEAK_TFLOPS if flops == flops else None
            print(json.dumps({
                "bs": bs, "regime": REGIME.value,
                "frozen_dtype": FROZEN_DTYPE,
                "step_s": round(step_s, 2),
                "imgs_per_sec": round(bs / step_s, 3),
                "compile_s": round(compile_s, 1),
                "loss": round(loss, 4),
                "train_params_M": round(n_train / 1e6, 1),
                "tflops_per_step": (round(flops / 1e12, 1)
                                    if flops == flops else None),
                "mfu_pct": round(mfu * 100, 1) if mfu else None,
            }), flush=True)
        except Exception as e:
            print(json.dumps({"bs": bs, "error": repr(e)[:200]}), flush=True)
            continue
        del state, step
        trainer._jit_step = None

    # ---- host input pipeline: can decode keep up? -----------------------
    from PIL import Image

    from magicdance_tpu.data.native import batch_load_images_rrc, native_rrc_available

    tmp = "/tmp/bench_train_imgs"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(24):
        p = os.path.join(tmp, f"{i}.jpg")
        if not os.path.exists(p):
            img = rng.randint(0, 255, (SIZE, SIZE, 3), np.uint8)
            Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    t0 = time.time()
    reps = 3
    for r in range(reps):
        batch_load_images_rrc(paths, SIZE, list(range(24)))
    dec_s = (time.time() - t0) / reps
    print(json.dumps({
        "native_decode": native_rrc_available(),
        "decode_24x512_s": round(dec_s, 3),
        "decode_imgs_per_sec": round(24 / dec_s, 1),
    }), flush=True)

    # ---- projected multi-chip gradient all-reduce -----------------------
    # DP over N chips all-reduces the trainable grads once per step: a ring
    # moves 2*(N-1)/N * bytes over ICI (v5e ~186 GB/s effective per ring).
    # Uses the last measured regime's trainable-param count.
    grad_bytes = n_train * 4  # f32 grads
    for n in (4, 8):
        t_ar = 2 * (n - 1) / n * grad_bytes / 186e9
        print(json.dumps({
            "projected_allreduce": {"chips": n,
                                    "grad_gb": round(grad_bytes / 1e9, 2),
                                    "allreduce_s": round(t_ar, 3)},
        }), flush=True)


if __name__ == "__main__":
    main()
