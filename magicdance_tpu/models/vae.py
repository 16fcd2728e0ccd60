"""AutoencoderKL — the SD1.5 VAE as Flax modules (NHWC).

TPU-native rebuild of the reference VAE
(ref: ldm/models/autoencoder.py:13 AutoencoderKL,
ldm/modules/diffusionmodules/model.py Encoder/Decoder/ResnetBlock/AttnBlock,
ldm/modules/distributions/distributions.py:24 DiagonalGaussianDistribution).
Config per models/cldm_v15_reference_only_pose.yaml:79-101: ch 128, mult
(1,2,4,4), 2 res blocks, no encoder attn resolutions, z 4 channels double_z,
scale factor 0.18215 applied in `encode_to_latent`
(ref ddpm.py:655 get_first_stage_encoding).

Faithfulness notes for checkpoint conversion: GroupNorm eps 1e-6; encoder
downsample is an asymmetric (0,1)x(0,1) pad + VALID stride-2 conv (ref
model.py Downsample); mid/decoder attention is single-head over spatial
positions via 1x1 convs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from magicdance_tpu.config import VAEConfig


class VAEResBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm1")(x.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm2")(h.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention via 1x1 convs (ref model.py AttnBlock)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        z = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        z = z.astype(self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="q")(z)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="k")(z)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="v")(z)
        # single-head attention over h*w positions; at 64x64 decode this is a
        # 4096-seq attention — route through the shared dispatcher (Pallas on
        # TPU) instead of materializing (B, 4096, 4096) fp32 logits. Q/K/V go
        # in bf16 (512-dim f32 K/V would not fit VMEM; logits/softmax stay
        # fp32 inside the kernel).
        from magicdance_tpu.ops.attention import dot_product_attention

        # bf16 only where the Pallas path needs it (TPU); fp32 parity elsewhere
        adt = (
            jnp.bfloat16
            if self.dtype == jnp.float32 and jax.default_backend() == "tpu"
            else self.dtype
        )
        q = q.reshape(b, h * w, 1, c).astype(adt)
        k = k.reshape(b, h * w, 1, c).astype(adt)
        v = v.reshape(b, h * w, 1, c).astype(adt)
        out = dot_product_attention(q, k, v).reshape(b, h, w, c).astype(self.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="proj_out")(out)
        return x + out


class VAEDownsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class VAEUpsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = nn.Conv(cfg.base_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv_in")(
            x.astype(self.dtype))
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.base_channels * mult
            for i in range(cfg.num_res_blocks):
                h = VAEResBlock(ch, dtype=self.dtype, name=f"down_{level}_block_{i}")(h)
            if level != len(cfg.channel_mult) - 1:
                h = VAEDownsample(ch, dtype=self.dtype, name=f"down_{level}_downsample")(h)
        h = VAEResBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm_out")(h.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        ch = cfg.base_channels * cfg.channel_mult[-1]
        h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z.astype(self.dtype))
        h = VAEResBlock(ch, dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResBlock(ch, dtype=self.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(cfg.channel_mult))):
            ch = cfg.base_channels * cfg.channel_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = VAEResBlock(ch, dtype=self.dtype, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                h = VAEUpsample(ch, dtype=self.dtype, name=f"up_{level}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm_out")(h.astype(jnp.float32))
        h = nn.silu(h).astype(self.dtype)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv_out")(h)


class GaussianPosterior(NamedTuple):
    """Diagonal Gaussian over latents (ref distributions.py:24)."""

    mean: jax.Array
    logvar: jax.Array

    def sample(self, rng: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(rng, self.mean.shape,
                                                   dtype=self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(self.mean**2 + var - 1.0 - self.logvar, axis=(1, 2, 3))


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.embed_dim, (1, 1), dtype=self.dtype,
                                  param_dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1), dtype=self.dtype,
                                       param_dtype=jnp.float32, name="post_quant_conv")

    def encode(self, x: jax.Array) -> GaussianPosterior:
        """x: (B, H, W, 3) in [-1, 1] → posterior over (B, H/8, W/8, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return GaussianPosterior(mean.astype(jnp.float32), logvar.astype(jnp.float32))

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, rng: jax.Array):
        posterior = self.encode(x)
        z = posterior.sample(rng)
        return self.decode(z), posterior


def encode_to_latent(posterior_mean_or_sample: jax.Array, scale_factor: float) -> jax.Array:
    """z → scaled model latent (ref ddpm.py:655)."""
    return posterior_mean_or_sample * scale_factor


def latent_to_decoder_input(latent: jax.Array, scale_factor: float) -> jax.Array:
    return latent / scale_factor
