"""CLI sample/eval end-to-end smoke on tiny configs + synthetic data."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def tiny_model_json(path):
    cfg = {
        "variant": "appearance_pose",
        "unet": {"model_channels": 32, "channel_mult": [1, 2],
                 "num_res_blocks": 1, "attention_resolutions": [1, 2],
                 "num_heads": 2, "context_dim": 16},
        "pose_control": {"model_channels": 32, "channel_mult": [1, 2],
                         "num_res_blocks": 1, "attention_resolutions": [1, 2],
                         "num_heads": 2, "context_dim": 16},
        "vae": {"base_channels": 32, "channel_mult": [1, 1, 1, 1],
                "num_res_blocks": 1},
        "clip": {"vocab_size": 49408, "hidden_size": 16, "num_layers": 1,
                 "num_heads": 2, "max_length": 77},
        "latent_size": 4,
        "dtype": "float32",
    }
    with open(path, "w") as f:
        json.dump(cfg, f)


def test_cli_sample_smoke(tmp_path):
    from magicdance_tpu.cli.sample import main

    rs = np.random.RandomState(0)
    ref = tmp_path / "ref.png"
    Image.fromarray(rs.randint(0, 255, (40, 30, 3)).astype(np.uint8)).save(ref)
    pose_dir = tmp_path / "poses"
    pose_dir.mkdir()
    for i in range(3):
        Image.fromarray(rs.randint(0, 255, (40, 30, 3)).astype(np.uint8)).save(
            pose_dir / f"{i:03d}.png")
    cfg = tmp_path / "model.json"
    tiny_model_json(cfg)
    out = tmp_path / "out"

    main(["--model_config", str(cfg), "--reference", str(ref),
          "--pose_dir", str(pose_dir), "--output", str(out),
          "--steps", "2", "--size", "32", "--gif"])

    frames = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(frames) == 3
    assert (out / "out.gif").exists()
    img = np.asarray(Image.open(out / "000.png"))
    assert img.shape == (32, 32, 3)


def test_cli_eval_smoke(tmp_path):
    from magicdance_tpu.cli.eval import main

    rs = np.random.RandomState(0)
    for split in ("disco_test_set", "pose_map_disco_test_set"):
        d = tmp_path / split / "vid0"
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(
                rs.randint(0, 255, (40, 30, 3)).astype(np.uint8)
            ).save(d / f"{i:04d}.png")
    cfg = tmp_path / "model.json"
    tiny_model_json(cfg)
    out = tmp_path / "eval_out"

    main(["--model_config", str(cfg), "--data", str(tmp_path),
          "--output", str(out), "--steps", "2", "--size", "32",
          "--batch", "3"])

    seq = out / "vid0"
    assert sorted(os.listdir(seq)) == ["gen_images", "gt_images", "pose_maps"]
    assert len(os.listdir(seq / "gen_images")) == 3  # frames 1..3

    # metric runner consumes the tree
    from magicdance_tpu.metrics.center import get_all_eval_scores

    res = get_all_eval_scores(str(out), ["l1", "ssim", "psnr"])
    assert res["num_images"] == 3
    assert 0 <= res["ssim"] <= 1


def test_cli_sample_video_mode(tmp_path):
    """--video routes through the temporal variant + overlap sampling."""
    from magicdance_tpu.cli.sample import main

    rs = np.random.RandomState(0)
    ref = tmp_path / "ref.png"
    Image.fromarray(rs.randint(0, 255, (40, 30, 3)).astype(np.uint8)).save(ref)
    pose_dir = tmp_path / "poses"
    pose_dir.mkdir()
    for i in range(6):
        Image.fromarray(rs.randint(0, 255, (40, 30, 3)).astype(np.uint8)).save(
            pose_dir / f"{i:03d}.png")
    cfg_path = tmp_path / "model.json"
    tiny_model_json(cfg_path)
    # enable motion modules in the tiny config
    cfg = json.load(open(cfg_path))
    cfg["variant"] = "appearance_pose_temporal"
    cfg["unet"]["use_motion_modules"] = True
    cfg["unet"]["motion_num_heads"] = 2
    json.dump(cfg, open(cfg_path, "w"))
    out = tmp_path / "out"

    main(["--model_config", str(cfg_path), "--reference", str(ref),
          "--pose_dir", str(pose_dir), "--output", str(out),
          "--steps", "2", "--size", "32", "--video",
          "--window", "4", "--stride", "3"])
    frames = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(frames) == 6


def test_cli_sample_turbo_flags(tmp_path):
    """The turbo flags reach SampleConfig and produce frames."""
    from magicdance_tpu.cli.sample import main

    rs = np.random.RandomState(0)
    ref = tmp_path / "ref.png"
    Image.fromarray(rs.randint(0, 255, (40, 30, 3)).astype(np.uint8)).save(ref)
    pose_dir = tmp_path / "poses"
    pose_dir.mkdir()
    for i in range(2):
        Image.fromarray(rs.randint(0, 255, (40, 30, 3)).astype(np.uint8)).save(
            pose_dir / f"{i:03d}.png")
    cfg = tmp_path / "model.json"
    tiny_model_json(cfg)
    out = tmp_path / "out"

    main(["--model_config", str(cfg), "--reference", str(ref),
          "--pose_dir", str(pose_dir), "--output", str(out),
          "--steps", "4", "--size", "32",
          "--cfg_interval", "0.15", "0.85", "--uncond_every", "2",
          "--pose_every", "2", "--deepcache_every", "2"])
    frames = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(frames) == 2
