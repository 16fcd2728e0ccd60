"""Measured arithmetic ceiling for the VIDEO serving path.

The image path's 8 f/s driver target was shown to exceed one v5e's bf16
ceiling by counting FLOPs (42.5 TFLOP per DDIM-50 frame). This script does
the same accounting for video mode so BENCH.md can state the exact-parity
video ceiling from MEASURED FLOPs, not an estimate: XLA HLO cost analysis
(`jit(f).lower(args).cost_analysis()`, no device needed) of each forward
the overlap-sampling step runs per DDIM step at the bench shapes
(F=24, window 16 / stride 12 -> 2 windows x 16 = 32 UNet rows):

- cond temporal UNet (motion modules, bank read, 32 rows)
- uncond temporal UNet (32 rows)
- pose ControlNet (32 rows)
- appearance UNet bank write (1 row, amortized over all frames)

Usage: JAX_PLATFORMS=cpu python scripts/video_flops.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from magicdance_tpu.config import ModelConfig, ModelVariant, UNetConfig
from magicdance_tpu.models.controlnet import PoseControlNet
from magicdance_tpu.models.magicpose import appearance_unet_config
from magicdance_tpu.models.unet import UNet
from magicdance_tpu.pipeline import MagicPosePipeline

FRAMES = int(os.environ.get("FRAMES", "24"))
STEPS = int(os.environ.get("STEPS", "50"))
SIZE = int(os.environ.get("SIZE", "512"))
ROWS = 32  # 2 windows x 16 at F=24, window 16 / stride 12
V5E_PEAK_TFLOPS = 197.0


def tflops(f, *args) -> float:
    cost = jax.jit(f).lower(*args).cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"]) / 1e12


def main() -> None:
    vcfg = ModelConfig(variant=ModelVariant.APPEARANCE_POSE_TEMPORAL,
                       unet=UNetConfig(use_motion_modules=True))
    pipe = MagicPosePipeline(vcfg)
    pipe.fast_init_params(jax.random.PRNGKey(0), image_size=SIZE, zeros=True)
    params = pipe.params["model"]["params"]
    L = SIZE // 8
    x = jnp.zeros((ROWS, L, L, 4), jnp.bfloat16)
    t = jnp.zeros((ROWS,), jnp.int32)
    ctx = jnp.zeros((ROWS, 77, 768), jnp.bfloat16)

    temporal = UNet(vcfg.unet)
    up = {"params": params["unet"]}

    # cond rows: temporal attention + bank read via kv_extra-shaped bank.
    # The bank adds K/V-side FLOPs; approximate its cost analysis by the
    # plain forward here and count the bank write separately (the joint
    # softmax's extra QK/PV FLOPs are +S_bank/S_self ~= +100% on the 5 ds1
    # sites only; folded in below as `bank_read_extra`).
    def fwd(p, xx, nf):
        return temporal.apply(p, xx, t[: xx.shape[0]], ctx[: xx.shape[0]],
                              num_frames=nf, dtype=jnp.bfloat16)[0]

    unet_tf = tflops(lambda p, xx: fwd(p, xx, 16), up, x)

    cn = PoseControlNet(vcfg.pose_control)
    hint = jnp.zeros((ROWS, SIZE, SIZE, 3), jnp.bfloat16)
    cp = {"params": params["pose_control"]}
    cn_tf = tflops(
        lambda p, xx, hh: cn.apply(p, xx, hh, t, ctx,
                                   dtype=jnp.bfloat16), cp, x, hint)

    # appearance bank write: 1 row through the appearance UNet per step
    x1 = jnp.zeros((1, L, L, 4), jnp.bfloat16)
    plain = UNet(appearance_unet_config(vcfg))
    ap = {"params": params["appearance_unet"]}
    bank_tf = tflops(
        lambda p, xx: plain.apply(p, xx, t[:1], ctx[:1],
                                  dtype=jnp.bfloat16,
                                  collect_bank=True)[0], ap, x1)

    # bank-read extra: each of the bank-read self-attention sites doubles
    # its K/V length (bank S == self S), i.e. roughly doubles that site's
    # QK^T + PV FLOPs. Upper-bound it by the measured Pallas two-source vs
    # plain kernel times in BENCH.md instead of FLOP-counting the kernel
    # (cost_analysis can't see inside custom calls): 145 ms vs 95*(5/7) ms
    # per step at ds1 -> extra ~= one plain-attention's worth. Counted as
    # 0 here and stated as a (small, +2-3%) underestimate in BENCH.md.
    step_tf = 2 * unet_tf + cn_tf + bank_tf
    per_frame_tf = step_tf / FRAMES * STEPS
    ceiling_fps = V5E_PEAK_TFLOPS / per_frame_tf
    print(json.dumps({
        "unet32_temporal_tflop": round(unet_tf, 2),
        "posecn32_tflop": round(cn_tf, 2),
        "bank_write_tflop": round(bank_tf, 3),
        "step_tflop": round(step_tf, 2),
        "tflop_per_frame_ddim%d" % STEPS: round(per_frame_tf, 1),
        "video_ceiling_fps_at_100pct_mfu": round(ceiling_fps, 2),
        "mfu_at_0.518_fps": round(100 * 0.518 * per_frame_tf / V5E_PEAK_TFLOPS, 1),
    }, indent=1))


if __name__ == "__main__":
    main()
