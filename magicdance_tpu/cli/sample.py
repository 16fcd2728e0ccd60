"""Zero-shot pose retargeting CLI: one reference image + a pose-map folder →
a generated frame sequence (+ optional GIF/MP4).

The product equivalent of the reference's test_any_image_pose.py
(:46-82 center-crop preprocessing, :139-172 cond prep, :210-262 frame loop,
scripts/inference_any_image_pose.sh flag set). Frames are generated as ONE
batch under a single jit instead of a Python frame loop.

Usage:
  python -m magicdance_tpu.cli.sample \
    --checkpoint pretrained_weights/model_state-110000.th \
    --reference example_data/image/ref.png \
    --pose_dir example_data/pose_sequence/001 \
    --output out/ [--steps 50] [--cfg 7.0] [--size 512] [--gif]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help=".th/.ckpt reference checkpoint (converted on load); "
                        "omit for random weights (smoke tests)")
    p.add_argument("--model_config", default=None,
                   help="ModelConfig JSON (defaults to full SD1.5-scale MagicPose)")
    p.add_argument("--reference", required=True, help="reference image path")
    p.add_argument("--pose_dir", required=True, help="folder of pose maps")
    p.add_argument("--image_hint_dir", default=None,
                   help="folder of second-ControlNet hints (DUAL_CONTROL "
                        "variant; same frame names as --pose_dir)")
    p.add_argument("--output", required=True)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--cfg", type=float, default=7.0)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch", type=int, default=0,
                   help="frames per device batch (0 = all at once)")
    p.add_argument("--prompt", default="", help="text prompt (default empty, "
                   "matching the reference recipe)")
    p.add_argument("--merges", default=None, help="CLIP BPE merges file "
                   "(needed only for non-empty prompts)")
    p.add_argument("--video", action="store_true",
                   help="temporal model variant: motion modules + overlap "
                        "sampling over --window/--stride frame windows")
    p.add_argument("--window", type=int, default=16)
    p.add_argument("--stride", type=int, default=12)
    p.add_argument("--gif", action="store_true")
    p.add_argument("--mp4", action="store_true")
    p.add_argument("--no_pose_noise", dest="wonoise", action="store_true",
                   default=True)
    # opt-in turbo modes (defaults are exact parity; see BENCH.md — all
    # three combined measured +36% on v5e)
    p.add_argument("--cfg_interval", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="apply CFG only while t/T is in [LO, HI] (inclusive); "
                        "skips the "
                        "uncond forward outside (e.g. 0.15 0.85)")
    p.add_argument("--uncond_every", type=int, default=1,
                   help="refresh the uncond eps every k-th CFG-active step, "
                        "reuse the cached value in between")
    p.add_argument("--pose_every", type=int, default=1,
                   help="refresh pose-ControlNet residuals every k-th step")
    p.add_argument("--deepcache_level", type=int, default=0,
                   help="DeepCache split level: 0 = deepest reuse (fastest),"
                        " 1 = recompute levels 0-1 per step (more accurate)")
    p.add_argument("--deepcache_every", type=int, default=1,
                   help="refresh the cond UNet's deep levels every k-th "
                        "step; run only the level-0 encoder/decoder in "
                        "between (DeepCache)")
    p.add_argument("--bank_every", type=int, default=1,
                   help="refresh the appearance bank (full-UNet-copy write "
                        "pass) every k-th step, reuse the cached bank in "
                        "between; biggest win at small frame batches")
    p.add_argument("--bank_downsample", type=int, default=1,
                   help="average-pool the largest appearance-bank entries "
                        "f x f before the read sites consume them (ToMe-"
                        "style KV reduction; cuts bank-read attention cost "
                        "at the pooled sites ~f^2)")
    p.add_argument("--self_kv_downsample", type=int, default=1,
                   help="average-pool SELF attention keys/values f x f at "
                        "the largest self-attention sites (queries/outputs "
                        "stay full resolution; static ToMe-style token "
                        "reduction)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler (xplane) trace of the "
                        "sampling run into DIR (TensorBoard-loadable)")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from magicdance_tpu.config import ModelConfig, SampleConfig
    from magicdance_tpu.data.tokenizer import CLIPTokenizer
    from magicdance_tpu.data.transforms import (
        prepare_image,
        to_hint_range,
        to_model_range,
        from_model_range,
    )
    from magicdance_tpu.pipeline import MagicPosePipeline

    if args.model_config:
        from magicdance_tpu import config as C

        cfg = C.load_json(args.model_config, C.ModelConfig)
    elif args.video:
        import dataclasses

        from magicdance_tpu.config import ModelVariant, UNetConfig

        cfg = ModelConfig(variant=ModelVariant.APPEARANCE_POSE_TEMPORAL,
                          unet=UNetConfig(use_motion_modules=True))
    else:
        cfg = ModelConfig()
    pipe = MagicPosePipeline(cfg, tokenizer=CLIPTokenizer(args.merges))
    if args.checkpoint:
        from magicdance_tpu.convert.torch_convert import (
            convert_magicpose_state,
            load_torch_state,
            to_jax,
        )

        sd = load_torch_state(args.checkpoint)
        pipe.params = to_jax(convert_magicpose_state(sd, cfg))
        pipe.cast_model_params(jnp.bfloat16)
    else:
        print("[sample] no checkpoint given — random weights (smoke mode)")
        pipe.fast_init_params(jax.random.PRNGKey(0), image_size=args.size)
        pipe.cast_model_params(jnp.bfloat16)

    ref = np.asarray(Image.open(args.reference).convert("RGB"))
    ref = to_model_range(prepare_image(ref, args.size))[None]

    pose_files = sorted(
        f for f in os.listdir(args.pose_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    poses = np.stack([
        to_hint_range(
            prepare_image(
                np.asarray(Image.open(os.path.join(args.pose_dir, f)).convert("RGB")),
                args.size,
            )
        )
        for f in pose_files
    ])

    ihints = None
    if args.image_hint_dir:
        ihints = np.stack([
            to_hint_range(
                prepare_image(
                    np.asarray(Image.open(
                        os.path.join(args.image_hint_dir, f)).convert("RGB")),
                    args.size,
                )
            )
            for f in pose_files
        ])

    scfg = SampleConfig(steps=args.steps, cfg_scale=args.cfg, eta=args.eta,
                        wonoise=args.wonoise, window=args.window,
                        stride=args.stride,
                        cfg_interval=(tuple(args.cfg_interval)
                                      if args.cfg_interval else None),
                        uncond_every=args.uncond_every,
                        pose_every=args.pose_every,
                        deepcache_every=args.deepcache_every,
                        bank_every=args.bank_every,
                        bank_downsample=args.bank_downsample,
                        self_kv_downsample=args.self_kv_downsample,
                        deepcache_level=args.deepcache_level)
    os.makedirs(args.output, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    import contextlib

    if args.profile:
        from magicdance_tpu.utils.profiling import trace

        profile_ctx = trace(args.profile)
    else:
        profile_ctx = contextlib.nullcontext()

    B = args.batch if args.batch > 0 else len(poses)
    frames = []
    with profile_ctx:
        for i in range(0, len(poses), B):
            chunk = poses[i : i + B]
            if len(chunk) < B:  # pad to keep one compiled shape
                pad = B - len(chunk)
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            else:
                pad = 0
            ih = None
            if ihints is not None:
                ih = ihints[i : i + B]
                if pad:
                    ih = np.concatenate([ih, np.repeat(ih[-1:], pad, 0)])
                ih = jnp.asarray(ih)
            imgs = pipe.sample_frames(rng, jnp.asarray(chunk),
                                      jnp.asarray(ref), scfg,
                                      video=args.video, image_hints=ih)
            imgs = np.asarray(imgs)
            if pad:
                imgs = imgs[:-pad]
            frames.extend(from_model_range(f) for f in imgs)

    for name, frame in zip(pose_files, frames):
        Image.fromarray(frame).save(os.path.join(args.output, name))
    print(f"[sample] wrote {len(frames)} frames to {args.output}")

    if args.gif or args.mp4:
        from magicdance_tpu.utils.video import frames_to_gif, frames_to_mp4

        if args.gif:
            print("[sample]", frames_to_gif(frames, os.path.join(args.output, "out.gif")))
        if args.mp4:
            print("[sample]", frames_to_mp4(frames, os.path.join(args.output, "out.mp4")))


if __name__ == "__main__":
    main()
