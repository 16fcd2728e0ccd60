"""Flax 3D-ResNet50 for TPU-native FID-VID.

First-party port of the FID-VID feature backbone
(ref: tool/metrics/resnet3d.py — Kinetics 3D-ResNet50, Hara et al.;
features.py:31-40 loads `resnet-50-kinetics.pth` with `last_fc=False`, so
the FID-VID feature is the flattened 2048-d pooled activation). Layout is
TPU-native NDHWC. Unlike I3D this net uses STATIC torch padding (pad 1/3
both sides), which differs from XLA SAME at stride 2 — paddings are
explicit. Input preprocessing per the reference: 0-255 pixels minus the
Kinetics channel mean (114.7748, 107.7354, 99.4750), clips of
sample_duration=16 at 112² (ref utils.py:463,498-500).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from magicdance_tpu.metrics.i3d_flax import BatchNormInference

KINETICS_PIXEL_MEAN = (114.7748, 107.7354, 99.4750)


class Bottleneck3D(nn.Module):
    """1-3-1 bottleneck with BN shortcut (ref resnet3d.py:71-107,
    shortcut_type 'B')."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = (self.stride,) * 3
        r = x
        h = nn.Conv(self.planes, (1, 1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(BatchNormInference(eps=1e-5, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3, 3), strides=s,
                    padding=((1, 1),) * 3, use_bias=False, name="conv2")(h)
        h = nn.relu(BatchNormInference(eps=1e-5, name="bn2")(h))
        h = nn.Conv(self.planes * 4, (1, 1, 1), use_bias=False,
                    name="conv3")(h)
        h = BatchNormInference(eps=1e-5, name="bn3")(h)
        if self.downsample:
            r = nn.Conv(self.planes * 4, (1, 1, 1), strides=s,
                        use_bias=False, name="downsample_conv")(x)
            r = BatchNormInference(eps=1e-5, name="downsample_bn")(r)
        return nn.relu(h + r)


class ResNet3D(nn.Module):
    """3D-ResNet50 feature extractor (ref resnet3d.py:110-184; last_fc
    behavior selected by `num_classes=None` -> flattened pooled features)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: float = 1.0
    num_classes: int | None = None

    def _c(self, n: int) -> int:
        return max(1, int(round(n * self.width)))

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, T, H, W, 3), 0-255 minus Kinetics pixel mean
        t_in, s_in = x.shape[1], x.shape[2]
        h = nn.Conv(self._c(64), (7, 7, 7), strides=(1, 2, 2),
                    padding=((3, 3),) * 3, use_bias=False, name="conv1")(x)
        h = nn.relu(BatchNormInference(eps=1e-5, name="bn1")(h))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        h = nn.max_pool(h, (3, 3, 3), strides=(2, 2, 2), padding="VALID")
        in_ch = self._c(64)
        for li, (planes, n_blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))
        ):
            p = self._c(planes)
            for i in range(n_blocks):
                ds = i == 0 and (stride != 1 or in_ch != p * 4)
                h = Bottleneck3D(planes=p, stride=stride if i == 0 else 1,
                                 downsample=ds,
                                 name=f"layer{li + 1}_{i}")(h)
            in_ch = p * 4
        kt = min(h.shape[1], math.ceil(t_in / 16))
        ks = min(h.shape[2], math.ceil(s_in / 32))
        h = nn.avg_pool(h, (kt, ks, ks), strides=(1, 1, 1), padding="VALID")
        h = h.reshape(h.shape[0], -1)
        if self.num_classes is not None:
            h = nn.Dense(self.num_classes, name="fc")(h)
        return h


# ---------------------------------------------------------------------------
# torch state-dict conversion (resnet-50-kinetics.pth: {'state_dict':
# {'module.conv1.weight', ...}}; features.py:34-39 strips 'module.')
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _bn(sd, p) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{p}.weight"]),
        "bias": _np(sd[f"{p}.bias"]),
        "mean": _np(sd[f"{p}.running_mean"]),
        "var": _np(sd[f"{p}.running_var"]),
    }


def _conv(sd, p) -> Dict[str, np.ndarray]:
    return {"kernel": np.transpose(_np(sd[f"{p}.weight"]), (2, 3, 4, 1, 0))}


def convert_resnet3d(
    sd: Mapping[str, Any], layers: Sequence[int] = (3, 4, 6, 3),
    with_fc: bool = False,
) -> Dict[str, Any]:
    """Kinetics 3D-ResNet50 state dict → ResNet3D param tree."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    tree: Dict[str, Any] = {"conv1": _conv(sd, "conv1"),
                            "bn1": _bn(sd, "bn1")}
    for li, n_blocks in enumerate(layers):
        for i in range(n_blocks):
            p = f"layer{li + 1}.{i}"
            sub: Dict[str, Any] = {}
            for j in (1, 2, 3):
                sub[f"conv{j}"] = _conv(sd, f"{p}.conv{j}")
                sub[f"bn{j}"] = _bn(sd, f"{p}.bn{j}")
            if f"{p}.downsample.0.weight" in sd:
                sub["downsample_conv"] = _conv(sd, f"{p}.downsample.0")
                sub["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
            tree[f"layer{li + 1}_{i}"] = sub
    if with_fc and "fc.weight" in sd:
        tree["fc"] = {"kernel": np.transpose(_np(sd["fc.weight"]), (1, 0)),
                      "bias": _np(sd["fc.bias"])}
    return tree
