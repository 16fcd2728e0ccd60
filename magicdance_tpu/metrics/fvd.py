"""FVD / FID-VID: video-level Frechet metrics.

Mirrors the DisCo video metrics (ref: tool/metrics/metric_center.py fvd /
fid-vid paths; tool/metrics/inception3d.py [I3D, FVD], resnet3d.py
[3D-ResNet50, FID-VID]). Zero-egress environment: the pretrained 3D
backbones must be supplied locally —

  * FVD: the public I3D state dict (`i3d_pretrained_400.pt`) — runs through
    the first-party Flax I3D (metrics/i3d_flax.py) on the JAX backend;
  * FID-VID: the Kinetics 3D-ResNet50 state dict
    (`resnet-50-kinetics.pth`) — first-party Flax port
    (metrics/resnet3d_flax.py);
  * TorchScript files still work as a torch-CPU fallback.

The Frechet math is shared with image FID (metrics/core.py). Videos are
(T, H, W, 3) uint8 folders or arrays; clips are resampled to the backbone's
expected length/size. Per-backbone preprocessing follows the reference
(ref utils.py:498-503: [-1,1] for I3D, pixel-mean subtraction for the
3D-ResNet).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np
from PIL import Image


def _load_video_model(weights_path: str):
    """Returns ("flax", state_dict) for a raw I3D state dict (the
    `i3d_pretrained_400.pt` format, ref features.py:42-44 — runs through the
    first-party Flax I3D on the default JAX backend), or ("torch", module)
    for a TorchScript file."""
    import torch

    try:
        obj = torch.load(weights_path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict):
            sd = obj.get("state_dict", obj)
            if any(k.startswith("Conv3d_1a_7x7") for k in sd):
                return "flax", {k: v for k, v in sd.items()}
            if any(k.removeprefix("module.").startswith("layer1.0.conv1")
                   for k in sd):
                # Kinetics 3D-ResNet50 (resnet-50-kinetics.pth) -> FID-VID
                return "flax_r3d", {k: v for k, v in sd.items()}
    except Exception:
        pass
    try:
        m = torch.jit.load(weights_path, map_location="cpu").eval()
        return "torch", m
    except Exception as e:
        raise ValueError(
            f"could not load video backbone from {weights_path}: {e}; provide "
            "the I3D state dict (i3d_pretrained_400.pt) or a TorchScript "
            "I3D/3D-ResNet file"
        )


def load_video_frames(folder: str, size: int = 224) -> np.ndarray:
    frames = []
    for f in sorted(os.listdir(folder)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = Image.open(os.path.join(folder, f)).convert("RGB")
        frames.append(np.asarray(img.resize((size, size), Image.BILINEAR)))
    return np.stack(frames) if frames else np.zeros((0, size, size, 3), np.uint8)


def _resample_clip(video: np.ndarray, length: int) -> np.ndarray:
    t = video.shape[0]
    if t == 0:
        return np.zeros((length,) + video.shape[1:], video.dtype)
    idx = np.linspace(0, t - 1, length).round().astype(int)
    return video[idx]


def segment_clips(video: np.ndarray, length: int) -> list[np.ndarray]:
    """Split a (T, H, W, 3) video into ceil(T/length) contiguous clips,
    padding the tail by repeating the last frame (the reference FID-VID
    convention, ref utils.py:310-319)."""
    t = video.shape[0]
    if t == 0:
        return [np.zeros((length,) + video.shape[1:], video.dtype)]
    pad = (-t) % length
    if pad:
        video = np.concatenate([video, np.repeat(video[-1:], pad, axis=0)])
    return list(video.reshape(-1, length, *video.shape[1:]))


def video_features(
    videos: Iterable[np.ndarray],
    weights_path: str,
    clip_len: int = 16,
    batch: int = 2,
    segment: Optional[bool] = None,
    _loaded=None,
) -> np.ndarray:
    """Features per clip; each video (T, H, W, 3) uint8.

    `segment=True` uses the reference FID-VID convention (contiguous
    16-frame chunks, one feature per chunk); `segment=False` resamples each
    video to one fixed-length clip (jit-friendly — one compiled shape).
    Default: segment for the 3D-ResNet (FID-VID), resample for I3D (FVD,
    where the reference feeds the whole variable-length video)."""
    import torch

    engine, model = _loaded if _loaded is not None \
        else _load_video_model(weights_path)
    if segment is None:
        segment = engine == "flax_r3d"
    if engine == "flax":
        import jax
        import jax.numpy as jnp

        from magicdance_tpu.metrics.i3d_flax import I3D, convert_i3d

        i3d = I3D()
        params = {"params": jax.tree.map(jnp.asarray, convert_i3d(model))}
        fn = jax.jit(lambda v: i3d.apply(params, v))
    elif engine == "flax_r3d":
        import jax
        import jax.numpy as jnp

        from magicdance_tpu.metrics.resnet3d_flax import (
            ResNet3D,
            convert_resnet3d,
        )

        r3d = ResNet3D()
        params = {"params": jax.tree.map(jnp.asarray,
                                         convert_resnet3d(model))}
        fn = jax.jit(lambda v: r3d.apply(params, v))
    feats = []
    buf = []

    def flush():
        if not buf:
            return
        x = np.stack(buf).astype(np.float32)  # (B, T, H, W, 3) 0-255
        if engine in ("flax", "flax_r3d"):
            import jax.numpy as jnp

            if engine == "flax":
                # I3D preprocessing: [-1, 1] (ref utils.py:501-503)
                xn = x / 127.5 - 1.0
            else:
                # 3D-ResNet: pixel-mean subtraction (ref utils.py:463,499)
                from magicdance_tpu.metrics.resnet3d_flax import (
                    KINETICS_PIXEL_MEAN,
                )

                xn = x - np.asarray(KINETICS_PIXEL_MEAN, np.float32)
            out = np.asarray(fn(jnp.asarray(xn)))
            feats.append(out.reshape(len(buf), -1))
            buf.clear()
            return
        x = torch.from_numpy(x / 127.5 - 1.0).permute(0, 4, 1, 2, 3).float()
        with torch.no_grad():
            out = model(x)
        feats.append(out.cpu().numpy().reshape(len(buf), -1))
        buf.clear()

    for v in videos:
        if segment:
            buf.extend(segment_clips(v, clip_len))
        else:
            buf.append(_resample_clip(v, clip_len))
        if len(buf) >= batch:
            flush()
    flush()
    return np.concatenate(feats) if feats else np.zeros((0, 400), np.float32)


def frechet_video_distance(
    gen_dirs: list[str],
    gt_dirs: list[str],
    weights_path: str,
    clip_len: int = 16,
    size: Optional[int] = None,
) -> float:
    """Frechet distance between the video features of two lists of frame
    folders. Frame size and clip handling follow the backbone the weights
    resolve to (ref utils.py:294: 112² segmented clips for the FID-VID
    3D-ResNet; 224² for I3D/FVD)."""
    from magicdance_tpu.metrics.core import (
        frechet_distance,
        gaussian_frechet_stats,
    )

    loaded = _load_video_model(weights_path)
    if size is None:
        size = 112 if loaded[0] == "flax_r3d" else 224
    gen_videos = (load_video_frames(d, size) for d in gen_dirs)
    gt_videos = (load_video_frames(d, size) for d in gt_dirs)
    f1 = video_features(gen_videos, weights_path, clip_len, _loaded=loaded)
    f2 = video_features(gt_videos, weights_path, clip_len, _loaded=loaded)
    mu1, s1 = gaussian_frechet_stats(f1)
    mu2, s2 = gaussian_frechet_stats(f2)
    return frechet_distance(mu1, s1, mu2, s2)


def fvd_between_roots(
    gen_root: str,
    gt_root: str,
    weights_path: str,
    gen_name: str = "gen_images",
    gt_name: str = "gt_images",
    clip_len: int = 16,
) -> float:
    """Walk `{root}/{seq}/{gen,gt}` video folders and compute the Frechet
    distance between pooled video features (FVD with I3D weights, FID-VID
    with a 3D-ResNet)."""
    seqs = [d for d in sorted(os.listdir(gen_root))
            if os.path.isdir(os.path.join(gen_root, d, gen_name))]
    return frechet_video_distance(
        [os.path.join(gen_root, s, gen_name) for s in seqs],
        [os.path.join(gt_root, s, gt_name) for s in seqs],
        weights_path, clip_len)
