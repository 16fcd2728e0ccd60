"""Per-bucket xprof breakdown of the full-scale train step.

Captures a jax.profiler trace of ONE compiled train step on the real chip
and buckets device-plane op durations (convs / matmuls+fusions / Pallas
attention / collectives / copies / rest) — the training analog of the
serving breakdown in BENCH.md "Where the time goes".

Usage: python scripts/profile_train_step.py  [BS=1] [REGIME=pose_only]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import json
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from magicdance_tpu.config import FreezeRegime, ModelConfig, TrainConfig
from magicdance_tpu.models import AutoencoderKL, CLIPTextEncoder, MagicPoseModel
from magicdance_tpu.pipeline import MagicPosePipeline
from magicdance_tpu.train.trainer import Trainer

SIZE = 512
BS = int(os.environ.get("BS", "1"))
REGIME = FreezeRegime(os.environ.get("REGIME", "pose_only"))
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/train_trace")


def bucket_of(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "pallas_kernels"
    if "convolution" in n or "conv" in n:
        return "convs"
    if "dot" in n or "gemm" in n or "matmul" in n:
        return "matmuls"
    if "all-reduce" in n or "all-gather" in n or "reduce-scatter" in n:
        return "collectives"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout/copies"
    if "fusion" in n:
        return "fusions(elementwise+)"
    return "other"


def parse_xplane(trace_dir: str) -> "tuple[dict, float]":
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return {}, 0.0
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    buckets = defaultdict(float)
    step_s = 0.0
    for plane in xs.planes:
        pname = plane.name.lower()
        if "tpu" not in pname and "device" not in pname:
            continue
        if "host" in pname:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "")
                if name.startswith("jit_train_step"):
                    # the module-level event = true device execution time
                    step_s = max(step_s, ev.duration_ps / 1e12)
                if not name.startswith("%"):
                    continue  # line aggregates / profiler artifacts
                if "copy-start" in name or "slice-start" in name:
                    # async DMA: durations OVERLAP compute (weight streaming,
                    # remat spills) — bucket separately, do not add to
                    # "device busy"
                    buckets["async_dma(overlapped)"] += ev.duration_ps / 1e12
                    continue
                buckets[bucket_of(name)] += ev.duration_ps / 1e12
    return dict(buckets), step_s


def main():
    model_cfg = ModelConfig()
    pipe = MagicPosePipeline(model_cfg)
    pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, scale=0.02)
    params = pipe.params
    model = MagicPoseModel(model_cfg)
    vae = AutoencoderKL(model_cfg.vae)
    clip = CLIPTextEncoder(model_cfg.clip)
    cfg = TrainConfig(model=model_cfg, freeze=REGIME,
                      batch_size_per_device=BS, image_size=SIZE)
    trainer = Trainer(cfg, model, vae, clip)
    state = trainer.create_state(params["model"], params["vae"],
                                 params["clip"])
    # the source f32 tree (~10 GB) must not stay on device next to the
    # train state (same fix as bench_train.py)
    pipe.params = None
    params = None
    import gc

    gc.collect()
    batch = {
        "image": jnp.zeros((BS, SIZE, SIZE, 3)),
        "reference": jnp.zeros((BS, SIZE, SIZE, 3)),
        "pose": jnp.zeros((BS, SIZE, SIZE, 3)),
        "input_ids": jnp.zeros((BS, model_cfg.clip.max_length), jnp.int32),
    }
    step = trainer.jitted_step(state, batch)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    _ = float(metrics["loss"])  # compile + sync

    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    loss = float(metrics["loss"])
    wall = time.time() - t0
    jax.profiler.stop_trace()

    buckets, step_s = parse_xplane(TRACE_DIR)
    print(json.dumps({"bs": BS, "regime": REGIME.value,
                      "wall_step_s": round(wall, 2),
                      "device_exec_s": round(step_s, 3),
                      "buckets_s": {k: round(v, 3) for k, v in
                                    sorted(buckets.items(),
                                           key=lambda kv: -kv[1])}},
                     indent=1), flush=True)


if __name__ == "__main__":
    main()
