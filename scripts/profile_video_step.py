"""Where the video time goes: overlap-sampling step breakdown.

Two measurements on the real chip (VERDICT r2 item 6):

1. Direct motion-module cost: forward time of the SAME 32-row UNet batch
   with and without the temporal transformers (identical weights
   otherwise) — the exact per-step motion overhead, no trace ambiguity.
2. xprof bucket breakdown of one full F=24 overlap-sampling call, with a
   dedicated `scatter/gather` bucket for the window scatter-average
   (ref ddim.py:586-594 pred_all/counts).

Usage: python scripts/profile_video_step.py  [FRAMES=24] [STEPS=50]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magicdance_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()

import glob
import json
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from magicdance_tpu.config import ModelConfig, ModelVariant, SampleConfig, UNetConfig
from magicdance_tpu.pipeline import MagicPosePipeline

FRAMES = int(os.environ.get("FRAMES", "24"))
STEPS = int(os.environ.get("STEPS", "50"))
SIZE = int(os.environ.get("SIZE", "512"))
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/video_trace")


def bucket_of(name: str) -> str:
    """Bucket by the OP NAME (the `%op = ...` head), never the whole HLO
    line: operand text routinely contains `copy-done`/`conv` substrings,
    which round-3 misbucketed real convolutions into "layout/copies" and
    GroupNorm `convert_reduce_fusion` stats into "convs" (round-4 fix —
    the corrected breakdown is in BENCH.md)."""
    import re

    m = re.match(r"%([a-z_0-9.-]+)", name.lower())
    n = m.group(1) if m else name.lower()
    if "scatter" in n or "gather" in n or "dynamic-update-slice" in n:
        return "scatter/gather(windows)"
    if "custom-call" in n or "mosaic" in n or "flash" in n:
        return "pallas_kernels"
    if "convert_reduce" in n or "reduce_fusion" in n:
        return "norm_stats_reduces"
    if "convolution" in n or n.startswith("conv"):
        return "convs"
    if "dot" in n or "gemm" in n or "matmul" in n:
        return "matmuls"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout/copies"
    if "fusion" in n:
        return "fusions(elementwise+)"
    return "other"


def parse_xplane(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return {}, 0.0, {}
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    buckets = defaultdict(float)
    ops = defaultdict(lambda: [0.0, 0])  # name -> [seconds, count]
    total = 0.0
    for plane in xs.planes:
        pname = plane.name.lower()
        if ("tpu" not in pname and "device" not in pname) or "host" in pname:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "")
                if name.startswith("jit_"):
                    total = max(total, ev.duration_ps / 1e12)
                if not name.startswith("%"):
                    continue
                if "copy-start" in name or "slice-start" in name:
                    buckets["async_dma(overlapped)"] += ev.duration_ps / 1e12
                    continue
                buckets[bucket_of(name)] += ev.duration_ps / 1e12
                rec = ops[name]
                rec[0] += ev.duration_ps / 1e12
                rec[1] += ev.occurrences if hasattr(ev, "occurrences") else 1
    return dict(buckets), total, dict(ops)


def sync(x):
    return float(jnp.mean(x))


def main():
    # ---- 1. direct motion-module overhead on a 32-row UNet forward -------
    from magicdance_tpu.models.unet import UNet

    vcfg = ModelConfig(variant=ModelVariant.APPEARANCE_POSE_TEMPORAL,
                       unet=UNetConfig(use_motion_modules=True))
    pipe = MagicPosePipeline(vcfg)
    pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, zeros=True)
    pipe.cast_model_params(jnp.bfloat16)
    uparams = {"params": pipe.params["model"]["params"]["unet"]}
    B, L = 32, SIZE // 8
    x = jnp.zeros((B, L, L, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 77, 768))

    temporal = UNet(vcfg.unet)
    # num_frames=16: temporal attention over the window axis
    f_t = jax.jit(lambda p, x: temporal.apply(p, x, t, ctx, num_frames=16,
                                              dtype=jnp.bfloat16)[0])
    # num_frames=1 folds to per-frame identity-ish temporal attention — for
    # the TRUE no-motion baseline build the plain UNet on the same weights
    plain_cfg = UNetConfig(use_motion_modules=False)
    plain = UNet(plain_cfg)
    pparams = {"params": {k: v for k, v in
                          uparams["params"].items()
                          if not k.startswith(("enc_motion", "dec_motion"))}}
    f_p = jax.jit(lambda p, x: plain.apply(p, x, t, ctx,
                                           dtype=jnp.bfloat16)[0])

    rows = {}
    for tag, fn, pr in (("unet32_motion", f_t, uparams),
                        ("unet32_plain", f_p, pparams)):
        sync(fn(pr, x))  # compile
        t0 = time.time()
        for _ in range(3):
            sync(fn(pr, x))
        rows[tag] = (time.time() - t0) / 3
    print(json.dumps({
        "unet32_motion_s": round(rows["unet32_motion"], 4),
        "unet32_plain_s": round(rows["unet32_plain"], 4),
        "motion_overhead_pct": round(
            100 * (rows["unet32_motion"] / rows["unet32_plain"] - 1), 1),
    }), flush=True)

    # ---- 2. xprof bucket breakdown of one full video sample call ---------
    pose = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, SIZE, SIZE, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 2 - 1
    scfg = SampleConfig(steps=STEPS, cfg_scale=7.0, window=16, stride=12)
    sync(pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg,
                            video=True))  # compile
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.time()
    sync(pipe.sample_frames(jax.random.PRNGKey(4), pose, ref, scfg,
                            video=True))
    wall = time.time() - t0
    jax.profiler.stop_trace()
    buckets, total, ops = parse_xplane(TRACE_DIR)
    print(json.dumps({
        "frames": FRAMES, "steps": STEPS,
        "wall_s": round(wall, 2),
        "fps": round(FRAMES / wall, 3),
        "device_exec_s": round(total, 3),
        "per_step_buckets_ms": {k: round(v / STEPS * 1e3, 1) for k, v in
                                sorted(buckets.items(),
                                       key=lambda kv: -kv[1])},
    }, indent=1), flush=True)
    # itemize: top ops per bucket so "layout/copies" etc. are attributable
    per_bucket = defaultdict(list)
    for name, (sec, cnt) in ops.items():
        per_bucket[bucket_of(name)].append((sec, cnt, name))
    for bk in ("layout/copies", "pallas_kernels", "convs",
               "fusions(elementwise+)", "other"):
        rows = sorted(per_bucket.get(bk, []), reverse=True)[:12]
        print(f"--- top ops in {bk} (ms/step, count/trace):", flush=True)
        for sec, cnt, name in rows:
            print(f"  {sec / STEPS * 1e3:8.2f}  {cnt:6d}  {name[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
