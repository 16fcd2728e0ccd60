"""LPIPS perceptual distance (VGG16 backbone) in Flax.

Rebuild of the LPIPS metric used by the DisCo suite
(ref: tool/metrics/ssim_l1_lpips_psnr.py — `lpips.LPIPS(net='vgg')`):
VGG16 conv features at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3,
unit-normalized per channel, squared差 weighted by learned 1x1 "lin" layers,
spatially averaged and summed over stages.

Pretrained weights cannot be downloaded here (zero egress); load them via
`convert_lpips_torch_state` from a torch `lpips` package state dict (the
torchvision VGG16 features + lin weights). Without weights the module still
runs (random features) for smoke tests — scores are then NOT comparable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (out_channels, n_convs) per stage
VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# input normalization used by lpips (shift/scale on [-1,1] inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        conv_i = 0
        for stage, (ch, n) in enumerate(VGG_STAGES):
            for _ in range(n):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
            feats.append(x)
            if stage != len(VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """a, b: (B, H, W, 3) in [-1, 1]. Returns (B,) distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        a = (a - shift) / scale
        b = (b - shift) / scale
        vgg = VGG16Features(name="vgg")
        fa = vgg(a)
        fb = vgg(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa**2, axis=-1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb**2, axis=-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{i}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def convert_lpips_torch_state(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a torch `lpips.LPIPS(net='vgg')` state dict (keys `net.slice{k}.*`
    torchvision-indexed convs + `lin{k}.model.1.weight`) onto the Flax LPIPS
    tree."""
    # torchvision VGG16.features conv indices
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

    def find(key_opts):
        for k in key_opts:
            if k in sd:
                return sd[k]
        raise KeyError(key_opts)

    vgg: Dict[str, Any] = {}
    # lpips stores vgg as net.sliceN.<tv_index>.weight
    for ci, ti in enumerate(tv_idx):
        w = find([f"net.slice{s}.{ti}.weight" for s in range(1, 6)]
                 + [f"net.features.{ti}.weight"])
        b = find([f"net.slice{s}.{ti}.bias" for s in range(1, 6)]
                 + [f"net.features.{ti}.bias"])
        vgg[f"conv_{ci}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
    out: Dict[str, Any] = {"vgg": vgg}
    for i in range(5):
        w = find([f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"])
        out[f"lin_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    return out


class LPIPSScorer:
    """Callable wrapper with (optionally) loaded weights."""

    def __init__(self, torch_weights_path: Optional[str] = None):
        self.model = LPIPS()
        if torch_weights_path:
            from magicdance_tpu.convert.torch_convert import load_torch_state

            sd = load_torch_state(torch_weights_path)
            self.params = {"params": jax.tree.map(
                jnp.asarray, convert_lpips_torch_state(sd))}
            self.calibrated = True
        else:
            self.params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
            )
            self.calibrated = False
        self._fn = jax.jit(self.model.apply)

    def __call__(self, a, b) -> np.ndarray:
        return np.asarray(self._fn(self.params, a, b))
