"""InceptionV3 (torchvision layout) in Flax — TPU-native FID features.

Replaces the reference's torch-side Inception feature extractors
(ref: tool/cleanfid/inception_* and tool/metrics/features.py:21
build_feature_extractor) with a jittable Flax model so large eval sets run
feature extraction on TPU. BatchNorms are FOLDED into the convolutions at
conversion (inference-exact), so the Flax model is conv+bias+relu only.

`convert_inception_torchvision` maps a torchvision `inception_v3` state dict
(Conv2d_1a_3x3.conv.weight / .bn.{weight,bias,running_mean,running_var},
Mixed_5b.branch1x1..., fc.*) onto this module. The clean-fid TorchScript
file keeps the torch-CPU path in metrics/fid.py (its pooling variants differ
slightly from torchvision; use whichever weights your baseline used).

Returns (pool_features (B, 2048), logits (B, 1000)).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _conv(ref, name, features, kernel, stride=1, padding=0):
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    return nn.Conv(features, kernel, strides=(stride, stride), padding=padding,
                   name=name, dtype=ref.dtype, param_dtype=jnp.float32)


def _avg_pool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionV3(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """x: (B, 299, 299, 3) in [-1, 1] (torchvision transform)."""
        C = lambda *a, **k: _conv(self, *a, **k)
        r = nn.relu
        x = r(C("Conv2d_1a_3x3", 32, 3, stride=2)(x.astype(self.dtype)))
        x = r(C("Conv2d_2a_3x3", 32, 3)(x))
        x = r(C("Conv2d_2b_3x3", 64, 3, padding=1)(x))
        x = _max_pool3s2(x)
        x = r(C("Conv2d_3b_1x1", 80, 1)(x))
        x = r(C("Conv2d_4a_3x3", 192, 3)(x))
        x = _max_pool3s2(x)

        def inception_a(x, pool_features, name):
            b1 = r(C(f"{name}.branch1x1", 64, 1)(x))
            b5 = r(C(f"{name}.branch5x5_1", 48, 1)(x))
            b5 = r(C(f"{name}.branch5x5_2", 64, 5, padding=2)(b5))
            b3 = r(C(f"{name}.branch3x3dbl_1", 64, 1)(x))
            b3 = r(C(f"{name}.branch3x3dbl_2", 96, 3, padding=1)(b3))
            b3 = r(C(f"{name}.branch3x3dbl_3", 96, 3, padding=1)(b3))
            bp = r(C(f"{name}.branch_pool", pool_features, 1)(_avg_pool3(x)))
            return jnp.concatenate([b1, b5, b3, bp], axis=-1)

        x = inception_a(x, 32, "Mixed_5b")
        x = inception_a(x, 64, "Mixed_5c")
        x = inception_a(x, 64, "Mixed_5d")

        # InceptionB
        b3 = r(C("Mixed_6a.branch3x3", 384, 3, stride=2)(x))
        bd = r(C("Mixed_6a.branch3x3dbl_1", 64, 1)(x))
        bd = r(C("Mixed_6a.branch3x3dbl_2", 96, 3, padding=1)(bd))
        bd = r(C("Mixed_6a.branch3x3dbl_3", 96, 3, stride=2)(bd))
        x = jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)

        def inception_c(x, c7, name):
            b1 = r(C(f"{name}.branch1x1", 192, 1)(x))
            b7 = r(C(f"{name}.branch7x7_1", c7, 1)(x))
            b7 = r(C(f"{name}.branch7x7_2", c7, (1, 7), padding=(0, 3))(b7))
            b7 = r(C(f"{name}.branch7x7_3", 192, (7, 1), padding=(3, 0))(b7))
            bd = r(C(f"{name}.branch7x7dbl_1", c7, 1)(x))
            bd = r(C(f"{name}.branch7x7dbl_2", c7, (7, 1), padding=(3, 0))(bd))
            bd = r(C(f"{name}.branch7x7dbl_3", c7, (1, 7), padding=(0, 3))(bd))
            bd = r(C(f"{name}.branch7x7dbl_4", c7, (7, 1), padding=(3, 0))(bd))
            bd = r(C(f"{name}.branch7x7dbl_5", 192, (1, 7), padding=(0, 3))(bd))
            bp = r(C(f"{name}.branch_pool", 192, 1)(_avg_pool3(x)))
            return jnp.concatenate([b1, b7, bd, bp], axis=-1)

        x = inception_c(x, 128, "Mixed_6b")
        x = inception_c(x, 160, "Mixed_6c")
        x = inception_c(x, 160, "Mixed_6d")
        x = inception_c(x, 192, "Mixed_6e")

        # InceptionD
        b3 = r(C("Mixed_7a.branch3x3_1", 192, 1)(x))
        b3 = r(C("Mixed_7a.branch3x3_2", 320, 3, stride=2)(b3))
        b7 = r(C("Mixed_7a.branch7x7x3_1", 192, 1)(x))
        b7 = r(C("Mixed_7a.branch7x7x3_2", 192, (1, 7), padding=(0, 3))(b7))
        b7 = r(C("Mixed_7a.branch7x7x3_3", 192, (7, 1), padding=(3, 0))(b7))
        b7 = r(C("Mixed_7a.branch7x7x3_4", 192, 3, stride=2)(b7))
        x = jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)

        def inception_e(x, name):
            b1 = r(C(f"{name}.branch1x1", 320, 1)(x))
            b3 = r(C(f"{name}.branch3x3_1", 384, 1)(x))
            b3a = r(C(f"{name}.branch3x3_2a", 384, (1, 3), padding=(0, 1))(b3))
            b3b = r(C(f"{name}.branch3x3_2b", 384, (3, 1), padding=(1, 0))(b3))
            b3 = jnp.concatenate([b3a, b3b], axis=-1)
            bd = r(C(f"{name}.branch3x3dbl_1", 448, 1)(x))
            bd = r(C(f"{name}.branch3x3dbl_2", 384, 3, padding=1)(bd))
            bda = r(C(f"{name}.branch3x3dbl_3a", 384, (1, 3), padding=(0, 1))(bd))
            bdb = r(C(f"{name}.branch3x3dbl_3b", 384, (3, 1), padding=(1, 0))(bd))
            bd = jnp.concatenate([bda, bdb], axis=-1)
            bp = r(C(f"{name}.branch_pool", 192, 1)(_avg_pool3(x)))
            return jnp.concatenate([b1, b3, bd, bp], axis=-1)

        x = inception_e(x, "Mixed_7b")
        x = inception_e(x, "Mixed_7c")

        pool = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
        logits = nn.Dense(1000, name="fc", dtype=self.dtype,
                          param_dtype=jnp.float32)(pool)
        return pool, logits


def convert_inception_torchvision(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision inception_v3 state dict → InceptionV3 tree, BN folded."""
    out: Dict[str, Any] = {}
    convs = sorted({k[: -len(".conv.weight")] for k in sd
                    if k.endswith(".conv.weight") and not k.startswith("AuxLogits")})
    for prefix in convs:
        w = sd[f"{prefix}.conv.weight"]  # OIHW, no bias
        gamma = sd[f"{prefix}.bn.weight"]
        beta = sd[f"{prefix}.bn.bias"]
        mean = sd[f"{prefix}.bn.running_mean"]
        var = sd[f"{prefix}.bn.running_var"]
        eps = 1e-3  # torchvision BasicConv2d BN eps
        scale = gamma / np.sqrt(var + eps)
        kernel = np.transpose(w, (2, 3, 1, 0)) * scale[None, None, None, :]
        bias = beta - mean * scale
        out[prefix] = {"kernel": kernel.astype(np.float32),
                       "bias": bias.astype(np.float32)}
    out["fc"] = {"kernel": np.transpose(sd["fc.weight"], (1, 0)),
                 "bias": sd["fc.bias"]}
    return out


class FlaxInceptionExtractor:
    """Jitted TPU feature extractor for FID/IS."""

    def __init__(self, torchvision_weights_path: str):
        from magicdance_tpu.convert.torch_convert import load_torch_state

        sd = load_torch_state(torchvision_weights_path)
        self.model = InceptionV3()
        self.params = {"params": jax.tree.map(
            jnp.asarray, convert_inception_torchvision(sd))}
        self._fn = jax.jit(self.model.apply)

    def __call__(self, images_01: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """images in [0,1], (B, 299, 299, 3) → (features, logits)."""
        pool, logits = self._fn(self.params,
                                jnp.asarray(images_01, jnp.float32) * 2 - 1)
        return np.asarray(pool), np.asarray(logits)
