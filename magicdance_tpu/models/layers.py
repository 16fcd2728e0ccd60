"""Flax building blocks for the SD1.5 UNet family.

TPU-first re-design of the reference's block zoo
(ref: ldm/modules/diffusionmodules/openaimodel.py:73-430 [ResBlock,
Up/Downsample, TimestepEmbedSequential], ldm/modules/attention.py:146-387
[CrossAttention, BasicTransformerBlock, SpatialTransformer],
ldm/modules/motion_module.py [AnimateDiff temporal transformer]).

Key departures from the reference:
  * NHWC layout everywhere (TPU conv-native), bf16 compute / f32 params.
  * The appearance "attention bank" is not a mutable side-channel list walked
    by a runtime `attn_index` counter (ref attention.py:287-313,
    openaimodel.py:79-108); blocks *return* their bank entry in write mode and
    *receive* it as an argument in read mode. Ordering is fixed by module
    traversal, so the fragile counter disappears.
  * fp32 attention logits/softmax built in (the reference needs an env-var
    fallback, attention.py:22).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from magicdance_tpu.ops.attention import (
    attention_packed,
    bank_read_attention_packed,
)


def nonlinearity(x: jax.Array) -> jax.Array:
    return nn.silu(x)


def _gn_stats_channel_first() -> bool:
    """Env gate for the channel-first GroupNorm stats formulation
    (``MAGICDANCE_GN_STATS=channel``). Measured and REJECTED on the real
    chip (scripts/bench_gn_stats.py, BENCH.md "What was tried"): 0.47x at
    the dominant ds1 shape — the extra full-width fp32 products and the
    per-group->per-channel broadcast cost more HBM traffic than the lane
    utilization recovers. Kept off-by-default for re-evaluation on future
    toolchains; numerics are identical to the flax path."""
    import os

    return os.environ.get("MAGICDANCE_GN_STATS", "") == "channel"


class _GNParams(nn.Module):
    """Scale/bias holder matching nn.GroupNorm's param layout (so the
    checkpoint tree is identical whichever compute path runs)."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32 regardless of compute dtype
    (ref: openaimodel GroupNorm32 casts to float).

    `act=True` applies the following SiLU (in compute dtype, after the fp32
    norm — identical graph to a separate `nonlinearity(.)` call). Setting
    ``MAGICDANCE_FUSED_GN=1`` dispatches GN+SiLU to a fused Pallas kernel
    (one HBM read) — 1.4x faster in ISOLATION at the three larger UNet GN
    shapes but ~5% SLOWER end-to-end (0.945 vs 0.997 f/s serving headline):
    the custom call is a fusion barrier that costs more than the saved
    read. Off by default; kept for re-evaluation on future
    toolchains (see BENCH.md "What was tried and rejected")."""

    epsilon: float = 1e-5
    num_groups: int = 32
    act: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import math

        orig_dtype = x.dtype
        c = x.shape[-1]
        groups = self.num_groups if c % self.num_groups == 0 else math.gcd(c, self.num_groups)

        use_pallas = False
        if self.act and x.ndim == 4 and c % groups == 0:
            import os

            from magicdance_tpu.ops.attention import _IMPL_OVERRIDE

            hw = x.shape[1] * x.shape[2]
            use_pallas = (
                os.environ.get("MAGICDANCE_FUSED_GN", "0") == "1"
                and jax.default_backend() == "tpu"
                and _IMPL_OVERRIDE.get() != "xla"  # training: forward-only
                and hw >= 256
            )
        if use_pallas:
            scale, bias = _GNParams(name="norm")(c)
            from magicdance_tpu.ops.pallas.groupnorm import groupnorm_silu

            return groupnorm_silu(x, scale, bias, groups=groups,
                                  eps=self.epsilon)

        if x.ndim == 4 and _gn_stats_channel_first():
            # Channel-first stats in plain XLA (no custom-call fusion
            # barrier): per-channel sum/sumsq over (H, W) with all C lanes
            # live, then a tiny (B, C)->(B, G) combine. flax's GroupNorm
            # reshapes to (..., HW, G, C/G) and reduces with only C/G = 10
            # lanes live at the UNet's ds1 shape — the `convert_reduce_
            # fusion` bucket the round-4 video profile measured at ~146 GB/s
            # (~5x off streaming). Same fp32 fast-variance numerics, same
            # "norm" param tree. Measured isolated (scripts/bench_gn_stats.py)
            # and REJECTED: 0.47x at ds1 — see BENCH.md "What was tried".
            scale, bias = _GNParams(name="norm")(c)
            b, hh, ww, _ = x.shape
            gsz = c // groups
            xf = x.astype(jnp.float32)
            s1 = jnp.sum(xf, axis=(1, 2))       # (B, C)
            s2 = jnp.sum(xf * xf, axis=(1, 2))  # (B, C)
            n = hh * ww * gsz
            mean_g = s1.reshape(b, groups, gsz).sum(-1) / n
            ex2_g = s2.reshape(b, groups, gsz).sum(-1) / n
            inv_g = jax.lax.rsqrt(ex2_g - mean_g * mean_g + self.epsilon)
            mean_c = jnp.repeat(mean_g, gsz, axis=-1)[:, None, None, :]
            inv_c = jnp.repeat(inv_g, gsz, axis=-1)[:, None, None, :]
            h = (xf - mean_c) * (inv_c * scale) + bias
            h = h.astype(orig_dtype)
            return nonlinearity(h) if self.act else h

        h = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32))
        h = h.astype(orig_dtype)
        if self.act:
            h = nonlinearity(h)
        return h


def conv3x3(features: int, *, dtype, name: Optional[str] = None, zero_init: bool = False):
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        padding=((1, 1), (1, 1)),
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros,
        name=name,
    )


def conv1x1(features: int, *, dtype, name: Optional[str] = None, zero_init: bool = False):
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        name=name,
    )


def dense(features: int, *, dtype, use_bias: bool = True, name: Optional[str] = None,
          zero_init: bool = False):
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        name=name,
    )


class TimestepEmbedMLP(nn.Module):
    """model_channels → 4*model_channels MLP over the sinusoidal embedding
    (ref: openaimodel.py:486-491 time_embed)."""

    model_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t_sinusoid: jax.Array) -> jax.Array:
        d = self.model_channels * 4
        h = dense(d, dtype=self.dtype, name="fc1")(t_sinusoid.astype(self.dtype))
        h = nonlinearity(h)
        return dense(d, dtype=self.dtype, name="fc2")(h)


class ResBlock(nn.Module):
    """Residual block with timestep-embedding injection
    (ref: openaimodel.py:183-265; use_scale_shift_norm=False as in SD1.5)."""

    out_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, *, deterministic: bool = True) -> jax.Array:
        h = GroupNorm32(name="norm_in", act=True)(x)
        h = conv3x3(self.out_channels, dtype=self.dtype, name="conv_in")(h)

        e = nonlinearity(emb)
        e = dense(self.out_channels, dtype=self.dtype, name="emb_proj")(e)
        h = h + e[:, None, None, :].astype(h.dtype)

        h = GroupNorm32(name="norm_out", act=True)(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        # zero-init output conv: block starts as identity (ref zero_module)
        h = conv3x3(self.out_channels, dtype=self.dtype, name="conv_out", zero_init=True)(h)

        if x.shape[-1] != self.out_channels:
            x = conv1x1(self.out_channels, dtype=self.dtype, name="skip")(x)
        return x + h


class Downsample(nn.Module):
    """Strided-conv 2x downsample (ref: openaimodel.py:154-181)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class Upsample(nn.Module):
    """Nearest 2x + conv (ref: openaimodel.py:111-132)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return conv3x3(self.out_channels, dtype=self.dtype, name="conv")(x)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (ref: attention.py FeedForward/GEGLU, mult=4)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        proj = dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate)
        return dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class CrossAttention(nn.Module):
    """Multi-head attention, q from x, k/v from context (or x if None)
    (ref: attention.py:146-199). fp32 logits; bank-read handled by caller via
    `kv_extra`.
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        kv_extra: Optional[jax.Array] = None,
        bank_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        to_q = dense(inner, dtype=self.dtype, use_bias=False, name="to_q")
        to_k = dense(inner, dtype=self.dtype, use_bias=False, name="to_k")
        to_v = dense(inner, dtype=self.dtype, use_bias=False, name="to_v")
        q, k, v = to_q(x), to_k(ctx), to_v(ctx)

        # q/k/v stay PACKED (B, S, H*D): the ops dispatch heads inside the
        # Pallas kernels on TPU (static lane slices), so no BSNH<->BHSD
        # transpose round-trips through HBM (~30 ms/DDIM-step saved, BENCH.md)
        if kv_extra is not None:
            # bank read: extra K/V come from the appearance bank entry; the
            # to_k/to_v projections are shared (the reference concatenates the
            # bank into `context` before projecting, attention.py:308-310).
            kb = to_k(kv_extra)
            vb = to_v(kv_extra)
            out = bank_read_attention_packed(q, k, v, kb, vb,
                                             num_heads=self.num_heads,
                                             bank_mask=bank_mask)
        else:
            out = attention_packed(q, k, v, num_heads=self.num_heads)
        return dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn(context) → GEGLU FF, pre-LN residuals, with the
    appearance-bank write/read protocol (ref: attention.py:253-320).

    write mode (collect=True): returns norm1(x) as the bank entry.
    read mode (bank_entry is not None): self-attention keys/values are the
    union of norm1(x) and the bank entry.
    plain mode: vanilla self-attention (the CFG uncond path, ref
    attention.py:280-281).
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array],
        bank_entry: Optional[jax.Array] = None,
        collect: bool = False,
        bank_mask: Optional[jax.Array] = None,
        kv_pool: int = 1,
        hw: Optional[Tuple[int, int]] = None,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """kv_pool > 1 (opt-in turbo, SampleConfig.self_kv_downsample):
        self-attention keys/values are average-pooled kv_pool x kv_pool over
        the site's (hw) spatial grid — queries/outputs stay full resolution
        (static-shape ToMe-style KV reduction). Exact when kv_pool == 1."""
        written = None
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        if collect:
            written = h
        kv_self = None  # None -> K/V from h itself (exact)
        if kv_pool > 1 and hw is not None:
            assert bank_mask is None, "self-KV pooling + gated bank_mask unsupported"
            hh, ww = hw
            if hh % kv_pool == 0 and ww % kv_pool == 0:
                b, s, c = h.shape
                p = kv_pool
                kv_self = (
                    h.reshape(b, hh // p, p, ww // p, p, c)
                    .astype(jnp.float32)
                    .mean(axis=(2, 4))
                    .reshape(b, (hh // p) * (ww // p), c)
                    .astype(h.dtype)
                )
        x = x + CrossAttention(
            num_heads=self.num_heads, head_dim=self.head_dim, dtype=self.dtype, name="attn1"
        )(h, context=kv_self, kv_extra=bank_entry, bank_mask=bank_mask)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        x = x + CrossAttention(
            num_heads=self.num_heads, head_dim=self.head_dim, dtype=self.dtype, name="attn2"
        )(h, context=context)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm3")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        x = x + GEGLUFeedForward(dim=x.shape[-1], dtype=self.dtype, name="ff")(h)
        return x, written


class SpatialTransformer(nn.Module):
    """GroupNorm → 1x1 proj_in → transformer blocks over (B, HW, C) →
    zero-init 1x1 proj_out → residual (ref: attention.py:323-387)."""

    num_heads: int
    head_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array],
        bank_entries: Optional[Tuple[jax.Array, ...]] = None,
        collect: bool = False,
        bank_mask: Optional[jax.Array] = None,
        kv_pool: int = 1,
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        b, h, w, c = x.shape
        residual = x
        z = GroupNorm32(epsilon=1e-6, name="norm")(x)
        z = conv1x1(self.num_heads * self.head_dim, dtype=self.dtype, name="proj_in")(z)
        z = z.reshape(b, h * w, -1)
        written = []
        for i in range(self.depth):
            entry = bank_entries[i] if bank_entries is not None else None
            z, w_i = BasicTransformerBlock(
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                dtype=self.dtype,
                name=f"block_{i}",
            )(z, context, bank_entry=entry, collect=collect,
              bank_mask=bank_mask, kv_pool=kv_pool, hw=(h, w))
            if collect:
                written.append(w_i)
        z = z.reshape(b, h, w, -1)
        z = conv1x1(c, dtype=self.dtype, name="proj_out", zero_init=True)(z)
        return residual + z, tuple(written)


class SinusoidalPositionalEncoding(nn.Module):
    """Fixed sinusoidal PE over the frame axis (ref: motion_module.py:227-245,
    max_len 24)."""

    max_len: int = 24

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, F, C)
        f, c = x.shape[1], x.shape[2]
        position = np.arange(self.max_len)[:, None]
        div = np.exp(np.arange(0, c, 2) * (-np.log(10000.0) / c))
        pe = np.zeros((self.max_len, c), dtype=np.float32)
        pe[:, 0::2] = np.sin(position * div)
        pe[:, 1::2] = np.cos(position * div)
        return x + jnp.asarray(pe[:f], dtype=x.dtype)[None]


class TemporalTransformer(nn.Module):
    """AnimateDiff-style temporal motion module
    (ref: motion_module.py:50-331 VanillaTemporalModule/TemporalTransformer3DModel).

    Operates on (B, F, H, W, C); attention runs over the frame axis with the
    spatial axes folded into batch ((B·H·W, F, C), ref motion_module.py:277).
    Each transformer block holds `attns_per_block` temporal self-attention
    units then one GEGLU FF (ref attention_block_types defaults to two
    "Temporal_Self" entries, motion_module.py:94,169 — matching the public
    AnimateDiff mm_sd_v15 checkpoints so their weights convert 1:1).
    proj_out is zero-initialized so the module starts as identity.
    """

    num_heads: int = 8
    max_len: int = 24
    num_layers: int = 1
    attns_per_block: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, hh, ww, c = x.shape
        residual = x
        z = GroupNorm32(epsilon=1e-6, name="norm")(x.reshape(b * f, hh, ww, c))
        z = z.reshape(b * f, hh * ww, c)
        z = dense(c, dtype=self.dtype, name="proj_in")(z)
        head_dim = c // self.num_heads
        # One transpose pair per module, not per attention unit: LayerNorm,
        # FF, residual adds, and proj_out are all per-token, so the entire
        # block stack runs in frame-minor layout (b*hw, f, c). The reference
        # rearranges '(b f) d c <-> (b d) f c' inside EVERY attention call
        # (motion_module.py:277). Measured effect of this hoist: none — XLA's
        # algebraic simplifier already moved the per-unit transposes through
        # the per-token ops (BENCH.md negative result), so this is a
        # trace-size/clarity win only; the xprof layout/copies bucket is
        # XLA's own BSNH/BHSD shuffles inside the seq-16 attention, which the
        # grouped block-diagonal Pallas kernel addresses. Identical math:
        # matmuls/norms see the same per-row values either way.
        z = z.reshape(b, f, hh * ww, c).transpose(0, 2, 1, 3)
        z = z.reshape(b * hh * ww, f, c)
        for i in range(self.num_layers):
            for j in range(self.attns_per_block):
                # temporal self-attention with sinusoidal frame PE (applied
                # to the normed input inside each attention unit, ref
                # motion_module.py:279-280)
                h = nn.LayerNorm(
                    epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                    name=f"norm_attn_{i}_{j}",
                )(z.astype(jnp.float32)).astype(z.dtype)
                h = SinusoidalPositionalEncoding(
                    max_len=self.max_len, name=f"pe_{i}_{j}")(h)
                z = z + CrossAttention(
                    num_heads=self.num_heads, head_dim=head_dim,
                    dtype=self.dtype, name=f"attn_{i}_{j}",
                )(h)
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                             name=f"norm_ff_{i}")(z.astype(jnp.float32)).astype(z.dtype)
            z = z + GEGLUFeedForward(dim=c, dtype=self.dtype, name=f"ff_{i}")(h)
        z = dense(c, dtype=self.dtype, name="proj_out", zero_init=True)(z)
        z = z.reshape(b, hh * ww, f, c).transpose(0, 2, 1, 3)
        return residual + z.reshape(b, f, hh, ww, c)
