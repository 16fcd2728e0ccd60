"""Pose ControlNet: UNet-encoder copy + zero convolutions + hint CNN.

TPU-native rebuild of the classic ControlNet branch
(ref: cldm/cldm.py:500-757 ControlNet): a stride-8 hint CNN embeds the
rendered 3-channel OpenPose skeleton map into latent resolution, the UNet
encoder (+ middle block) runs on `x_noisy + hint`, and 13 zero-initialized
1x1 convolutions tap the residual stream: one per encoder skip (12, incl.
conv_in, ref cldm.py:597,664,689) plus one after the middle block
(ref cldm.py:730 middle_block_out). The 13-tuple is consumed positionally by
`UNet(pose_residuals=...)` (ref cldm.py:59-112), entries [0..11] = encoder
skips, [12] = middle.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from magicdance_tpu.config import ControlNetConfig, UNetConfig
from magicdance_tpu.models.layers import (
    Downsample,
    ResBlock,
    SpatialTransformer,
    TimestepEmbedMLP,
    conv1x1,
    conv3x3,
    nonlinearity,
)
from magicdance_tpu.models.unet import unet_plan
from magicdance_tpu.ops.schedules import timestep_embedding


class HintEncoder(nn.Module):
    """8-conv stride-8 hint embedder, zero-init final conv
    (ref: cldm.py:599-615 input_hint_block)."""

    model_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hint: jax.Array) -> jax.Array:
        widths = [(16, 1), (16, 1), (32, 2), (32, 1), (96, 2), (96, 1), (256, 2)]
        h = hint.astype(self.dtype)
        for i, (w, s) in enumerate(widths):
            h = nn.Conv(w, kernel_size=(3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32, name=f"conv_{i}")(h)
            h = nonlinearity(h)
        return conv3x3(self.model_channels, dtype=self.dtype, name="conv_out",
                       zero_init=True)(h)


class PoseControlNet(nn.Module):
    cfg: ControlNetConfig

    def _unet_cfg(self) -> UNetConfig:
        return UNetConfig(
            model_channels=self.cfg.model_channels,
            channel_mult=self.cfg.channel_mult,
            num_res_blocks=self.cfg.num_res_blocks,
            attention_resolutions=self.cfg.attention_resolutions,
            num_heads=self.cfg.num_heads,
            transformer_depth=self.cfg.transformer_depth,
            context_dim=self.cfg.context_dim,
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        hint: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array],
        *,
        deterministic: bool = True,
        dtype: jnp.dtype = jnp.bfloat16,
        self_kv_pool: int = 1,
        self_kv_min_seq: int = 4096,
    ) -> Tuple[jax.Array, ...]:
        """x: (B, h, w, 4) noisy latent; hint: (B, 8h, 8w, 3) pose map in
        [0, 1]. Returns the 13-tuple of zero-conv residuals (fp32)."""
        cfg = self.cfg
        ucfg = self._unet_cfg()
        if cfg.remat:
            RB = nn.remat(ResBlock)
            ST = nn.remat(SpatialTransformer, static_argnums=(4, 6))
        else:
            RB, ST = ResBlock, SpatialTransformer
        t_emb = timestep_embedding(timesteps, cfg.model_channels, dtype=dtype)
        emb = TimestepEmbedMLP(cfg.model_channels, dtype=dtype, name="time_embed")(t_emb)

        guided = HintEncoder(cfg.model_channels, dtype=dtype, name="hint_encoder")(hint)

        units, _, _ = unet_plan(ucfg)
        h = conv3x3(cfg.model_channels, dtype=dtype, name="conv_in")(x.astype(dtype))
        h = h + guided
        outs = [conv1x1(cfg.model_channels, dtype=dtype, name="zero_conv_0",
                        zero_init=True)(h)]
        res_i = down_i = attn_i = 0
        zc = 1
        for u in units:
            if u["kind"] == "res":
                h = RB(u["ch"], dtype=dtype, name=f"enc_res_{res_i}")(
                    h, emb, deterministic=deterministic)
                res_i += 1
                if u["attn"]:
                    # opt-in self-KV pooling mirrors the main UNet's sites
                    # (SampleConfig.self_kv_downsample)
                    kvp = (self_kv_pool if self_kv_pool > 1
                           and h.shape[1] * h.shape[2] >= self_kv_min_seq
                           else 1)
                    h, _ = ST(
                        num_heads=cfg.num_heads, head_dim=u["ch"] // cfg.num_heads,
                        depth=cfg.transformer_depth, dtype=dtype,
                        name=f"enc_attn_{attn_i}",
                    )(h, context.astype(dtype) if context is not None else None,
                      None, False, None, kvp)
                    attn_i += 1
            else:
                h = Downsample(u["ch"], dtype=dtype, name=f"enc_down_{down_i}")(h)
                down_i += 1
            outs.append(conv1x1(u["ch"], dtype=dtype, name=f"zero_conv_{zc}",
                                zero_init=True)(h))
            zc += 1

        mid_ch = cfg.model_channels * cfg.channel_mult[-1]
        h = RB(mid_ch, dtype=dtype, name="mid_res_0")(h, emb,
                                                            deterministic=deterministic)
        h, _ = ST(
            num_heads=cfg.num_heads, head_dim=mid_ch // cfg.num_heads,
            depth=cfg.transformer_depth, dtype=dtype, name="mid_attn",
        )(h, context.astype(dtype) if context is not None else None,
          None, False, None, 1)
        h = RB(mid_ch, dtype=dtype, name="mid_res_1")(h, emb,
                                                            deterministic=deterministic)
        outs.append(conv1x1(mid_ch, dtype=dtype, name="zero_conv_mid", zero_init=True)(h))
        return tuple(o.astype(jnp.float32) for o in outs)
