"""FID feature extraction + distance.

Mirrors the vendored clean-fid pipeline (ref: tool/cleanfid/fid.py —
torchscript InceptionV3 (pt_inception-2015-12-05) pool3 features, bicubic
resize to 299, features → Frechet distance). The environment has no network
egress, so the Inception weights must be supplied as a local file:

  * a TorchScript file (the clean-fid `.pt`) — run via torch CPU, exactly
    the reference feature path; or
  * a torchvision `inception_v3` state dict — loaded into torchvision's
    module (torch CPU).

Feature extraction for quality metrics is offline/host-side work (the
reference also runs it in a separate process on whatever device is around);
the TPU serving/training path is unaffected. A Flax/TPU Inception port is a
planned optimization for large eval sets.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image


def _load_extractor(weights_path: str):
    import torch

    try:
        m = torch.jit.load(weights_path, map_location="cpu").eval()
        return ("torchscript", m)
    except Exception:
        pass
    try:
        from torchvision.models import inception_v3
    except ImportError as e:
        raise ValueError(
            f"{weights_path} is not a TorchScript file and torchvision is "
            "not installed; supply the clean-fid TorchScript InceptionV3 "
            "(pt_inception-2015-12-05.pt) or a torchvision state dict with "
            "torchvision available"
        ) from e

    m = inception_v3(weights=None, aux_logits=True, init_weights=False)
    sd = torch.load(weights_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    m.load_state_dict(sd)
    m.fc = torch.nn.Identity()
    m.eval()
    return ("torchvision", m)


def folder_features(
    folder: str, weights_path: str, batch: int = 32, size: int = 299
) -> np.ndarray:
    """Pool3/2048-dim features for every image in a folder.

    A torchvision-layout state dict runs through the Flax InceptionV3 on the
    default JAX backend (TPU when available); TorchScript files (clean-fid)
    run via torch CPU."""
    try:
        from magicdance_tpu.metrics.inception_flax import FlaxInceptionExtractor

        extractor = FlaxInceptionExtractor(weights_path)
        files = sorted(
            f for f in os.listdir(folder)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        feats = []
        for i in range(0, len(files), batch):
            imgs = []
            for f in files[i : i + batch]:
                img = Image.open(os.path.join(folder, f)).convert("RGB")
                imgs.append(np.asarray(img.resize((size, size), Image.BICUBIC),
                                       np.float32) / 255.0)
            pool, _ = extractor(np.stack(imgs))
            feats.append(pool)
        return (np.concatenate(feats) if feats
                else np.zeros((0, 2048), np.float32))
    except (KeyError, ValueError):
        pass  # not a torchvision-layout state dict -> torch path

    import torch

    kind, model = _load_extractor(weights_path)
    feats = []
    files = sorted(
        f for f in os.listdir(folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    with torch.no_grad():
        for i in range(0, len(files), batch):
            imgs = []
            for f in files[i : i + batch]:
                img = Image.open(os.path.join(folder, f)).convert("RGB")
                img = img.resize((size, size), Image.BICUBIC)
                imgs.append(np.asarray(img, np.float32))
            x = torch.from_numpy(np.stack(imgs)).permute(0, 3, 1, 2)
            if kind == "torchscript":
                # clean-fid torchscript takes uint8-range tensors
                out = model(x, return_features=True)
            else:
                x = x / 127.5 - 1.0
                out = model(x)
                if isinstance(out, tuple):
                    out = out[0]
            feats.append(out.cpu().numpy().reshape(len(imgs), -1))
    return np.concatenate(feats) if feats else np.zeros((0, 2048), np.float32)


def folder_logits(
    folder: str, weights_path: str, batch: int = 32, size: int = 299
) -> np.ndarray:
    """Class logits (N, 1000) for every image in a folder — the inception
    score input (ref tool/metrics/utils.py:517-531 'clean_InceptionScore').

    Torchvision-layout state dicts run through the Flax InceptionV3 (which
    returns (pool, logits)); TorchScript clean-fid files run on torch CPU
    without `return_features` so the script returns logits."""
    files = sorted(
        f for f in os.listdir(folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    try:
        from magicdance_tpu.metrics.inception_flax import FlaxInceptionExtractor

        extractor = FlaxInceptionExtractor(weights_path)
        out = []
        for i in range(0, len(files), batch):
            imgs = []
            for f in files[i : i + batch]:
                img = Image.open(os.path.join(folder, f)).convert("RGB")
                imgs.append(np.asarray(img.resize((size, size), Image.BICUBIC),
                                       np.float32) / 255.0)
            _, logits = extractor(np.stack(imgs))
            out.append(logits)
        return (np.concatenate(out) if out
                else np.zeros((0, 1000), np.float32))
    except (KeyError, ValueError):
        pass  # not a torchvision-layout state dict -> torch path

    import torch

    kind, model = _load_extractor(weights_path)
    out = []
    with torch.no_grad():
        for i in range(0, len(files), batch):
            imgs = []
            for f in files[i : i + batch]:
                img = Image.open(os.path.join(folder, f)).convert("RGB")
                imgs.append(np.asarray(img.resize((size, size), Image.BICUBIC),
                                       np.float32))
            x = torch.from_numpy(np.stack(imgs)).permute(0, 3, 1, 2)
            if kind != "torchscript":
                # the torchvision fallback strips fc for features — pre-fc
                # activations are NOT logits; refuse rather than mis-score
                raise ValueError(
                    "inception score needs class logits: supply the clean-fid"
                    " TorchScript InceptionV3 or a torchvision-layout state "
                    "dict (Flax path)")
            y = model(x)  # clean-fid script: logits without the flag
            out.append(y.cpu().numpy().reshape(len(imgs), -1))
    return np.concatenate(out) if out else np.zeros((0, 1000), np.float32)


def fid_between_folders(
    gen_dir: str, gt_dir: str, weights_path: str
) -> float:
    from magicdance_tpu.metrics.core import (
        frechet_distance,
        gaussian_frechet_stats,
    )

    f1 = folder_features(gen_dir, weights_path)
    f2 = folder_features(gt_dir, weights_path)
    mu1, s1 = gaussian_frechet_stats(f1)
    mu2, s2 = gaussian_frechet_stats(f2)
    return frechet_distance(mu1, s1, mu2, s2)
