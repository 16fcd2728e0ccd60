"""End-to-end CLI training smoke test: synthetic TikTok-v4 tree → 2 steps of
stage-2 training on the 8-device CPU mesh, checkpoint save, resume, and the
periodic sample-grid visualization."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def make_dataset(root, n_videos=2, n_frames=10, size=32):
    rs = np.random.RandomState(0)
    for split in ("train_set", "pose_map_train_set"):
        for v in range(n_videos):
            d = root / split / f"{v:05d}"
            d.mkdir(parents=True)
            for i in range(n_frames):
                img = rs.randint(0, 255, (size, size, 3)).astype(np.uint8)
                Image.fromarray(img).save(d / f"{i:04d}.png")


def tiny_config_json(path, steps=2):
    cfg = {
        "model": {
            "variant": "appearance_pose",
            "unet": {"model_channels": 32, "channel_mult": [1, 2],
                     "num_res_blocks": 1, "attention_resolutions": [1, 2],
                     "num_heads": 2, "context_dim": 16},
            "pose_control": {"model_channels": 32, "channel_mult": [1, 2],
                             "num_res_blocks": 1,
                             "attention_resolutions": [1, 2],
                             "num_heads": 2, "context_dim": 16},
            # 4 VAE levels -> /8, so pose hint (image size) = 8 x latent
            "vae": {"base_channels": 32, "channel_mult": [1, 1, 1, 1],
                    "num_res_blocks": 1},
            "clip": {"vocab_size": 49408, "hidden_size": 16, "num_layers": 1,
                     "num_heads": 2, "max_length": 77},
            "latent_size": 4,
            "dtype": "float32",
        },
        "optim": {"learning_rate": 1e-4, "warmup_steps": 1},
        "freeze": "finetune_control",
        "batch_size_per_device": 1,
        "num_train_steps": steps,
        "image_size": 32,
        "img_bin_limit": 29,
        "logging_steps": 1,
        "logging_gen_steps": 2,
        "vis_steps": 2,
        "save_steps": 2,
    }
    with open(path, "w") as f:
        json.dump(cfg, f)


def test_cli_train_end_to_end(tmp_path):
    from magicdance_tpu.cli.train import main

    make_dataset(tmp_path)
    cfg_path = tmp_path / "cfg.json"
    tiny_config_json(cfg_path, steps=2)
    out = tmp_path / "run"

    main(["--config", str(cfg_path), "--data", str(tmp_path),
          "--output", str(out), "--steps", "2", "--image_size", "32"])

    ckpts = os.listdir(out / "checkpoints")
    assert any(c.startswith("step_") for c in ckpts)
    assert (out / "tb" / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in open(out / "tb" / "metrics.jsonl")]
    assert any(np.isfinite(l.get("loss", np.nan)) for l in lines)
    # visualization grid written at step 2
    assert (out / "samples").exists() and os.listdir(out / "samples")


@pytest.mark.slow
def test_cli_train_resume(tmp_path):
    from magicdance_tpu.cli.train import main

    make_dataset(tmp_path)
    cfg_path = tmp_path / "cfg.json"
    tiny_config_json(cfg_path, steps=2)
    out = tmp_path / "run"
    main(["--config", str(cfg_path), "--data", str(tmp_path),
          "--output", str(out), "--steps", "2", "--image_size", "32"])
    # resume: continue to step 4 from the saved checkpoint
    main(["--config", str(cfg_path), "--data", str(tmp_path),
          "--output", str(out), "--steps", "4", "--image_size", "32"])
    steps = sorted(os.listdir(out / "checkpoints"))
    assert steps[-1] == "step_00000004"


def test_prefetch_loader_close_joins_threads():
    """Regression: close() must actually terminate the worker/transfer
    threads. A leaked transfer thread keeps issuing jax.device_put calls
    that race later XLA compilations in the same process (observed as an
    XLA-CPU segfault in full-suite runs)."""
    import threading
    import time as _time

    import numpy as np

    from magicdance_tpu.data.loader import PrefetchLoader

    def factory(worker):
        def gen():
            while True:  # infinite producer — close() must still win
                yield {"x": np.zeros((2, 4), np.float32)}
        return gen()

    before = threading.active_count()
    loader = PrefetchLoader(factory, workers=2, host_depth=1, device_depth=1)
    batch = next(loader)
    assert batch["x"].shape == (2, 4)
    loader.close()
    for t in loader._threads:
        assert not t.is_alive(), "loader thread survived close()"
    # double-close is safe
    loader.close()
    # thread count returns to (at most) the pre-loader level
    deadline = _time.time() + 5
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def tiny_stage3_config_json(path, steps=2):
    """Temporal (stage-3) tiny config: 2-frame clips, MOTION_ONLY freeze."""
    cfg = {
        "model": {
            "variant": "appearance_pose_temporal",
            "unet": {"model_channels": 32, "channel_mult": [1, 2],
                     "num_res_blocks": 1, "attention_resolutions": [1, 2],
                     "num_heads": 2, "context_dim": 16,
                     "use_motion_modules": True, "motion_num_heads": 2},
            "pose_control": {"model_channels": 32, "channel_mult": [1, 2],
                             "num_res_blocks": 1,
                             "attention_resolutions": [1, 2],
                             "num_heads": 2, "context_dim": 16},
            "vae": {"base_channels": 32, "channel_mult": [1, 1, 1, 1],
                    "num_res_blocks": 1},
            "clip": {"vocab_size": 49408, "hidden_size": 16, "num_layers": 1,
                     "num_heads": 2, "max_length": 77},
            "latent_size": 4,
            "dtype": "float32",
        },
        "optim": {"learning_rate": 1e-4, "warmup_steps": 1},
        "freeze": "motion_only",
        "batch_size_per_device": 1,
        "num_train_steps": steps,
        "image_size": 32,
        "video_frames": 2,
        "frame_stride": 1,
        "logging_steps": 1,
        "logging_gen_steps": 1000,  # skip vis (covered by the stage-2 test)
        "vis_steps": 2,
        "save_steps": 2,
    }
    with open(path, "w") as f:
        json.dump(cfg, f)


def test_cli_train_stage3_motion(tmp_path):
    """Stage-3 e2e: AnimateDiff motion init merged over the UNet, 2 train
    steps on 2-frame clips through the video dataset, checkpoint saved —
    the recipe the reference never shipped (ref train_tiktok.py:847-956)."""
    import sys

    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_ref import TorchMotionModule

    from magicdance_tpu.cli.train import main

    make_dataset(tmp_path, n_videos=2, n_frames=6)
    cfg_path = tmp_path / "cfg.json"
    tiny_stage3_config_json(cfg_path, steps=2)

    # tiny AnimateDiff-layout motion checkpoint for the enc_motion_0 site
    torch.manual_seed(0)
    mm_sd = {f"down_blocks.0.motion_modules.0.{k}": v
             for k, v in TorchMotionModule(32, 2).state_dict().items()}
    mm_path = tmp_path / "mm_tiny.ckpt"
    torch.save(mm_sd, str(mm_path))

    out = tmp_path / "run3"
    main(["--config", str(cfg_path), "--data", str(tmp_path),
          "--output", str(out), "--steps", "2", "--image_size", "32",
          "--motion_module_checkpoint", str(mm_path)])

    ckpts = os.listdir(out / "checkpoints")
    assert any(c.startswith("step_") for c in ckpts)
    lines = [json.loads(l) for l in open(out / "tb" / "metrics.jsonl")]
    assert any(np.isfinite(l.get("loss", np.nan)) for l in lines)
