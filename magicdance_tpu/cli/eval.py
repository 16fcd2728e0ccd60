"""Eval-set inference: TikTok test split → gen/gt/pose image trees.

The product equivalent of the reference's test_tiktok.py (:341 main,
:192-280 visualize — writes `{itr}/gen_images|gt_images|pose_maps/NNN.jpg`
trees consumed by the metric runner). Frames are batched per sequence; the
metric runner is `python -m magicdance_tpu.metrics.center`.

Usage:
  python -m magicdance_tpu.cli.eval --checkpoint ...th --data TikTok-v4 \
      --output eval_out [--steps 50] [--cfg 7.0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--model_config", default=None,
                   help="ModelConfig JSON (defaults to full SD1.5-scale MagicPose)")
    p.add_argument("--data", required=True, help="TikTok-v4 root")
    p.add_argument("--output", required=True)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--cfg", type=float, default=7.0)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch", type=int, default=8, help="frames per jit batch")
    p.add_argument("--max_videos", type=int, default=0)
    p.add_argument("--every_nth", type=int, default=1)
    p.add_argument("--rank", type=int, default=None,
                   help="shard the eval videos: this process handles videos "
                        "[rank::world] (default: jax.process_index() — the "
                        "reference shards test_tiktok the same way under "
                        "torchrun, test_tiktok.py:357)")
    p.add_argument("--world", type=int, default=None)
    # opt-in turbo modes (defaults exact; BENCH.md) — exposed here so their
    # metric impact can be measured with the same harness
    p.add_argument("--cfg_interval", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"))
    p.add_argument("--uncond_every", type=int, default=1)
    p.add_argument("--pose_every", type=int, default=1)
    p.add_argument("--deepcache_every", type=int, default=1)
    p.add_argument("--deepcache_level", type=int, default=0)
    p.add_argument("--bank_every", type=int, default=1)
    p.add_argument("--bank_downsample", type=int, default=1)
    p.add_argument("--self_kv_downsample", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from magicdance_tpu.config import ModelConfig, SampleConfig
    from magicdance_tpu.data.tiktok import TikTokEvalDataset
    from magicdance_tpu.data.transforms import from_model_range
    from magicdance_tpu.pipeline import MagicPosePipeline

    if args.model_config:
        from magicdance_tpu import config as C

        cfg = C.load_json(args.model_config, C.ModelConfig)
    else:
        cfg = ModelConfig()
    pipe = MagicPosePipeline(cfg)
    if args.checkpoint:
        from magicdance_tpu.convert.torch_convert import (
            convert_magicpose_state,
            load_torch_state,
            to_jax,
        )

        pipe.params = to_jax(
            convert_magicpose_state(load_torch_state(args.checkpoint), cfg)
        )
        pipe.cast_model_params(jnp.bfloat16)
    else:
        print("[eval] no checkpoint — random weights (smoke mode)")
        pipe.fast_init_params(jax.random.PRNGKey(0), image_size=args.size)
        pipe.cast_model_params(jnp.bfloat16)

    scfg = SampleConfig(steps=args.steps, cfg_scale=args.cfg,
                        cfg_interval=(tuple(args.cfg_interval)
                                      if args.cfg_interval else None),
                        uncond_every=args.uncond_every,
                        pose_every=args.pose_every,
                        deepcache_every=args.deepcache_every,
                        deepcache_level=args.deepcache_level,
                        bank_every=args.bank_every,
                        bank_downsample=args.bank_downsample,
                        self_kv_downsample=args.self_kv_downsample)
    rank = args.rank if args.rank is not None else jax.process_index()
    world = args.world if args.world is not None else jax.process_count()
    ds = TikTokEvalDataset(root=args.data, image_size=args.size,
                           every_nth=args.every_nth,
                           rank=rank, world_size=world)
    rng = jax.random.PRNGKey(args.seed)

    for vi, seq in enumerate(ds):
        if args.max_videos and vi >= args.max_videos:
            break
        out_dir = os.path.join(args.output, seq["video"])
        for sub in ("gen_images", "gt_images", "pose_maps"):
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

        poses, gts = seq["pose"], seq["gt"]
        B = args.batch
        for i in range(0, len(poses), B):
            chunk = poses[i : i + B]
            pad = B - len(chunk) if len(chunk) < B else 0
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            imgs = np.asarray(pipe.sample_frames(
                rng, jnp.asarray(chunk), jnp.asarray(seq["reference"]), scfg
            ))
            if pad:
                imgs = imgs[:-pad]
            for j, img in enumerate(imgs):
                name = seq["frame_names"][i + j]
                Image.fromarray(from_model_range(img)).save(
                    os.path.join(out_dir, "gen_images", name))
                Image.fromarray(from_model_range(gts[i + j])).save(
                    os.path.join(out_dir, "gt_images", name))
                Image.fromarray((poses[i + j] * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, "pose_maps", name))
        print(f"[eval] {seq['video']}: {len(poses)} frames")
    print(f"[eval] done → {args.output}; run "
          f"`python -m magicdance_tpu.metrics.center --root {args.output}`")


if __name__ == "__main__":
    main()
