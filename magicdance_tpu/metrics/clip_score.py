"""CLIP image-text similarity scoring (ref: tool/ClipScore.py:9
CLIPSimilarity — folder scorer over generated frames).

Adds the CLIP ViT-L/14 VISION tower in Flax (the text tower lives in
models/clip.py) plus a converter from HF `CLIPModel` state dicts, and a
folder-level scorer. Weights must be provided locally (zero egress).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from magicdance_tpu.config import CLIPTextConfig
from magicdance_tpu.models.clip import CLIPLayer, CLIPTextEncoder

# CLIP normalization constants
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionConfigLite:
    def __init__(self, hidden_size=1024, num_layers=24, num_heads=16,
                 image_size=224, patch_size=14, projection_dim=768):
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.image_size = image_size
        self.patch_size = patch_size
        self.projection_dim = projection_dim


class CLIPVisionEncoder(nn.Module):
    """ViT image tower: patch conv → [CLS]+patches → pre-LN transformer →
    post-LN CLS → projection."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 14
    projection_dim: int = 768

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels: (B, H, W, 3), CLIP-normalized. Returns projected embeds
        (B, projection_dim), unnormalized."""
        b, h, w, _ = pixels.shape
        patches = nn.Conv(self.hidden_size,
                          (self.patch_size, self.patch_size),
                          strides=(self.patch_size, self.patch_size),
                          use_bias=False, name="patch_embedding")(pixels)
        patches = patches.reshape(b, -1, self.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.hidden_size)), patches], axis=1
        )
        npos = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (npos, self.hidden_size))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layernorm")(x)
        # vision tower has no causal mask
        zero_mask = jnp.zeros((1, 1, npos, npos), jnp.float32)
        cfg = CLIPTextConfig(hidden_size=self.hidden_size,
                             num_heads=self.num_heads,
                             num_layers=self.num_layers)
        for i in range(self.num_layers):
            x = CLIPLayer(cfg, name=f"layer_{i}")(x, zero_mask)
        cls_out = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x[:, 0])
        return nn.Dense(self.projection_dim, use_bias=False,
                        name="visual_projection")(cls_out)


def convert_clip_vision(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIPModel vision keys → CLIPVisionEncoder tree."""
    p = "vision_model"
    out: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": np.transpose(
                sd[f"{p}.embeddings.patch_embedding.weight"], (2, 3, 1, 0))
        },
        "class_embedding": sd[f"{p}.embeddings.class_embedding"],
        "position_embedding": sd[f"{p}.embeddings.position_embedding.weight"],
        "pre_layernorm": {
            "scale": sd[f"{p}.pre_layrnorm.weight"]
            if f"{p}.pre_layrnorm.weight" in sd else sd[f"{p}.pre_layernorm.weight"],
            "bias": sd[f"{p}.pre_layrnorm.bias"]
            if f"{p}.pre_layrnorm.bias" in sd else sd[f"{p}.pre_layernorm.bias"],
        },
        "post_layernorm": {
            "scale": sd[f"{p}.post_layernorm.weight"],
            "bias": sd[f"{p}.post_layernorm.bias"],
        },
        "visual_projection": {
            "kernel": np.transpose(sd["visual_projection.weight"], (1, 0))
        },
    }
    lin = lambda k: {"kernel": np.transpose(sd[f"{k}.weight"], (1, 0)),
                     "bias": sd[f"{k}.bias"]}
    nrm = lambda k: {"scale": sd[f"{k}.weight"], "bias": sd[f"{k}.bias"]}
    i = 0
    while f"{p}.encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        lp = f"{p}.encoder.layers.{i}"
        out[f"layer_{i}"] = {
            "self_attn": {
                "q_proj": lin(f"{lp}.self_attn.q_proj"),
                "k_proj": lin(f"{lp}.self_attn.k_proj"),
                "v_proj": lin(f"{lp}.self_attn.v_proj"),
                "out_proj": lin(f"{lp}.self_attn.out_proj"),
            },
            "layer_norm1": nrm(f"{lp}.layer_norm1"),
            "layer_norm2": nrm(f"{lp}.layer_norm2"),
            "fc1": lin(f"{lp}.mlp.fc1"),
            "fc2": lin(f"{lp}.mlp.fc2"),
        }
        i += 1
    return out


def preprocess_clip_image(img: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 HWC → CLIP-normalized float (size, size, 3)."""
    from PIL import Image

    pil = Image.fromarray(img.astype(np.uint8)).resize((size, size),
                                                       Image.BICUBIC)
    x = np.asarray(pil, np.float32) / 255.0
    return (x - _MEAN) / _STD


class CLIPScorer:
    """Image-image (and optionally image-text) cosine similarity over
    folders (ref tool/ClipScore.py)."""

    def __init__(self, clip_weights_path: Optional[str] = None):
        self.vision = CLIPVisionEncoder()
        if clip_weights_path:
            from magicdance_tpu.convert.torch_convert import load_torch_state

            sd = load_torch_state(clip_weights_path)
            self.params = {"params": jax.tree.map(
                jnp.asarray, convert_clip_vision(sd))}
            self.calibrated = True
        else:
            self.params = self.vision.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
            self.calibrated = False
        self._embed = jax.jit(self.vision.apply)

    def embed_images(self, imgs: np.ndarray) -> np.ndarray:
        # precision "highest" at trace time: the TPU default would run the
        # ViT's convs/matmuls with bf16 inputs, perturbing scores vs the
        # fp32 CUDA reference (ref tool/ClipScore.py runs fp32)
        with jax.default_matmul_precision("highest"):
            e = np.asarray(self._embed(self.params, jnp.asarray(imgs)))
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    def image_similarity(self, folder_a: str, folder_b: str,
                         batch: int = 16) -> float:
        from magicdance_tpu.metrics.center import paired_batches

        sims = []
        for a, b in paired_batches(folder_a, folder_b, batch):
            ea = self.embed_images(np.stack([preprocess_clip_image(x) for x in a]))
            eb = self.embed_images(np.stack([preprocess_clip_image(x) for x in b]))
            sims.extend((ea * eb).sum(-1).tolist())
        return float(np.mean(sims))
