"""Training CLI: two-stage MagicPose curriculum on a TPU mesh.

The product equivalent of the reference's train_tiktok.py entry
(ref: train_tiktok.py:546 main; scripts/appearance_control_pretraining.sh and
scripts/appearance_disentangle_pose_control.sh recipes). Stage selection is
explicit (`--stage 1|2|3` or a JSON config), not YAML-filename string
matching (SURVEY.md §5 "Config / flag system" traps).

Usage:
  python -m magicdance_tpu.cli.train --stage 2 --data TikTok-v4 \
      --output runs/stage2 [--init_checkpoint ...th] [--steps 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="TrainConfig JSON")
    p.add_argument("--stage", type=int, default=2, choices=(1, 2, 3))
    p.add_argument("--data", required=True, help="TikTok-v4 root")
    p.add_argument("--output", required=True)
    p.add_argument("--init_checkpoint", default=None,
                   help="torch checkpoint to initialize from (converted)")
    p.add_argument("--motion_module_checkpoint", default=None,
                   help="AnimateDiff (or reference-layout) motion-module "
                        "torch checkpoint merged over the UNet init — the "
                        "merge_state_dict_mm stage-3 surgery "
                        "(ref train_tiktok.py:146-192)")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch", type=int, default=None, help="per-device batch")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--save_steps", type=int, default=None)
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from magicdance_tpu import config as C
    from magicdance_tpu.data.loader import PrefetchLoader
    from magicdance_tpu.data.tiktok import TikTokPairDataset
    from magicdance_tpu.data.tiktok_video import TikTokClipDataset
    from magicdance_tpu.data.tokenizer import empty_prompt_ids
    from magicdance_tpu.models import AutoencoderKL, CLIPTextEncoder, MagicPoseModel
    from magicdance_tpu.parallel.mesh import make_mesh
    from magicdance_tpu.train.checkpoint import CheckpointManager
    from magicdance_tpu.train.trainer import Trainer
    from magicdance_tpu.utils.logging import MetricLogger

    if args.config:
        cfg = C.load_json(args.config, C.TrainConfig)
    else:
        cfg = {1: C.stage1_appearance_pretrain,
               2: C.stage2_pose_control,
               3: C.stage3_motion}[args.stage]()
    updates = {}
    if args.steps:
        updates["num_train_steps"] = args.steps
    if args.batch:
        updates["batch_size_per_device"] = args.batch
    if args.save_steps:
        updates["save_steps"] = args.save_steps
    updates["output_dir"] = args.output
    updates["seed"] = args.seed
    updates["image_size"] = args.image_size
    cfg = dataclasses.replace(cfg, **updates)
    if args.lr:
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, learning_rate=args.lr)
        )

    os.makedirs(args.output, exist_ok=True)
    C.save_json(cfg, os.path.join(args.output, "config.json"))

    mesh = make_mesh(cfg.mesh_axes)
    n_dev = mesh.devices.size
    global_batch = cfg.batch_size_per_device * n_dev
    print(f"[train] mesh={mesh.shape} global_batch={global_batch}")

    model = MagicPoseModel(cfg.model)
    vae = AutoencoderKL(cfg.model.vae)
    clip = CLIPTextEncoder(cfg.model.clip)
    trainer = Trainer(cfg, model, vae, clip, mesh=mesh)

    # ---- parameter init -------------------------------------------------
    rng = jax.random.PRNGKey(cfg.seed)
    if args.init_checkpoint:
        from magicdance_tpu.convert.torch_convert import (
            convert_magicpose_state,
            load_torch_state,
            to_jax,
        )

        sd = load_torch_state(args.init_checkpoint)
        tree = to_jax(convert_magicpose_state(sd, cfg.model))
        mp, vp, cp = tree["model"], tree.get("vae"), tree.get("clip")
        if vp is None or cp is None:
            raise ValueError("checkpoint lacks VAE/CLIP weights; supply a full "
                             "model_state/.ckpt file")
    else:
        print("[train] random init (no --init_checkpoint)")
        latent = cfg.image_size // 8
        x = jnp.zeros((1, latent, latent, 4))
        kw = {}
        if cfg.model.has_appearance:
            kw["reference_noisy"] = x
        if cfg.model.has_pose:
            kw["pose_hint"] = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        mp = model.init(rng, x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, cfg.model.clip.max_length,
                                   cfg.model.unet.context_dim)), **kw)
        vp = vae.init(rng, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)), rng)
        cp = clip.init(rng, jnp.zeros((1, cfg.model.clip.max_length), jnp.int32))

    if args.motion_module_checkpoint:
        # stage-3 surgery: overlay AnimateDiff motion weights on the UNet
        # (merge_state_dict_mm, ref train_tiktok.py:146-192)
        from magicdance_tpu.convert.torch_convert import (
            convert_motion_modules,
            load_torch_state,
            merge_motion_state,
            to_jax,
        )

        mm_sd = load_torch_state(args.motion_module_checkpoint)
        mm_tree = to_jax(convert_motion_modules(mm_sd, cfg.model.unet))
        mp = dict(mp)
        mp["params"] = dict(mp["params"])
        mp["params"]["unet"] = merge_motion_state(
            dict(mp["params"]["unet"]), mm_tree)
        print(f"[train] merged {len(mm_tree)} motion modules from "
              f"{args.motion_module_checkpoint}")

    state = trainer.create_state(mp, vp, cp)
    ckpt = CheckpointManager(os.path.join(args.output, "checkpoints"),
                             cfg.save_total_limit)
    start_step = 0
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(target=state)
        # restored arrays are committed to a single device; re-place them
        # onto the mesh with the ZeRO-1 layout the jitted step expects
        state = jax.device_put(state, trainer.state_shardings(state))
        start_step = int(state.step)
        print(f"[train] resumed from step {start_step}")

    # ---- data -----------------------------------------------------------
    # temporal (stage-3) training consumes F-frame clips, frame-folded into
    # the batch axis (ref train_tiktok.py:1189-1200); image stages consume
    # (reference, target) pairs
    F = trainer.num_frames
    ids = empty_prompt_ids(global_batch * F, cfg.model.clip.max_length)

    def it_factory(worker: int):
        if cfg.model.has_temporal:
            ds = TikTokClipDataset(
                root=args.data,
                image_size=cfg.image_size,
                clip_len=cfg.video_frames,
                frame_stride=cfg.frame_stride,
                use_pose=cfg.model.has_pose,
                seed=cfg.seed * 1000 + worker,
            )
        else:
            ds = TikTokPairDataset(
                root=args.data,
                image_size=cfg.image_size,
                img_bin_limit=cfg.img_bin_limit,
                use_pose=cfg.model.has_pose,
                seed=cfg.seed * 1000 + worker,
            )
        for batch in ds.batches(global_batch):
            batch["input_ids"] = ids
            if not cfg.model.has_pose:
                batch.pop("pose", None)
            yield batch

    # pass the Mesh: the loader builds rank-aware batch shardings per key
    loader = PrefetchLoader(it_factory, workers=2, sharding=mesh)

    # ---- periodic visualization (ref train_tiktok.py:388-531,1258-1268:
    # every logging_gen_steps rank 0 samples a val batch and writes a
    # GT | pose | generated | reference comparison grid) ------------------
    def visualize(it: int, batch: dict, state) -> None:
        from magicdance_tpu.parallel.multihost import is_primary

        if not is_primary():
            return
        import numpy as np

        from magicdance_tpu.config import SampleConfig
        from magicdance_tpu.data.transforms import from_model_range
        from magicdance_tpu.pipeline import MagicPosePipeline
        from magicdance_tpu.train.trainer import merge_params
        from magicdance_tpu.utils.video import save_image_grid

        pipe = MagicPosePipeline(cfg.model)
        pipe.params = {
            "model": {"params": merge_params(
                jax.device_get(state.train_params),
                jax.device_get(state.frozen_params["model"]))},
            "vae": {"params": jax.device_get(state.frozen_params["vae"])},
            "clip": {"params": jax.device_get(state.frozen_params["clip"])},
        }
        n = min(2, batch["image"].shape[0])
        pose = jnp.asarray(batch["pose"][:n]) if "pose" in batch else None
        ref = jnp.asarray(batch["reference"][:1])
        gen = np.asarray(pipe.sample_frames(
            jax.random.PRNGKey(it), pose, ref,
            SampleConfig(steps=cfg.vis_steps, cfg_scale=7.0),
            video=cfg.model.has_temporal))
        rows = []
        for i in range(n):
            row = [from_model_range(np.asarray(batch["image"][i]))]
            if pose is not None:
                row.append((np.asarray(pose[i]) * 255).astype(np.uint8))
            row.append(from_model_range(gen[i]))
            row.append(from_model_range(np.asarray(batch["reference"][0])))
            rows.append(row)
        out = os.path.join(args.output, "samples", f"step_{it:08d}.png")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        save_image_grid(rows, out)
        print(f"[train] wrote sample grid {out}")

    # ---- loop -----------------------------------------------------------
    logger = MetricLogger(os.path.join(args.output, "tb"))
    try:
        batch = next(loader)
        step_fn = trainer.jitted_step(state, batch)
        t_last = time.time()
        for it in range(start_step, cfg.num_train_steps):
            vis_batch = batch if (it + 1) % cfg.logging_gen_steps == 0 else None
            state, metrics = step_fn(state, batch, jax.random.fold_in(rng, it))
            batch = next(loader)
            if (it + 1) % cfg.logging_steps == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t_last
                t_last = time.time()
                ips = cfg.logging_steps * global_batch / dt
                logger.log(it + 1, {**m, "images_per_sec": ips})
                print(f"[train] step {it+1} loss={m['loss']:.4f} "
                      f"{ips:.1f} img/s")
            if vis_batch is not None:
                try:
                    visualize(it + 1, jax.device_get(vis_batch), state)
                except Exception as e:  # visualization must never kill training
                    print(f"[train] visualize failed: {e}")
            if (it + 1) % cfg.save_steps == 0:
                ckpt.save(it + 1, jax.device_get(state))
                print(f"[train] saved step {it+1}")
        ckpt.save(cfg.num_train_steps, jax.device_get(state))
    finally:
        # leaked loader threads issue device_puts that race later
        # compilations in the same process (observed XLA-CPU segfault)
        loader.close()
        logger.close()
    print("[train] done")


if __name__ == "__main__":
    main()
