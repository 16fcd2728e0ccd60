"""SD1.5 UNet with appearance-bank and pose-ControlNet hooks.

One Flax module covers all four reference UNet variants
(ref: ldm/modules/diffusionmodules/openaimodel.py:432 UNetModel,
cldm/cldm.py:27 ControlledUnetModel, :59 ControlledUnetModelAttnPose,
:115 ControlledUnetModelAttn, openaimodel.py:811 UNetModel_Temporal):

  * `collect_bank=True`  — appearance "write" pass: every BasicTransformerBlock
    returns its pre-self-attention hidden states; the tuple of all entries (in
    fixed module-traversal order) is the appearance bank
    (ref: attention.py:287-298 write mode; cldm.py:469-497).
  * `bank=(...)`         — main "read" pass: each block's self-attention K/V
    additionally attend over the matching bank entry
    (ref: attention.py:301-313; cldm.py:59-112).
  * `bank=None, collect_bank=False` — plain SD1.5 forward (the CFG uncond
    path, ref cldm.py:71-84).
  * `pose_residuals=(r0..r11, r_mid)` — classic ControlNet residuals added at
    the middle block and each decoder skip (ref: cldm.py:93-104).
  * `num_frames>1` with cfg.use_motion_modules — AnimateDiff temporal
    attention interleaved after every res/attn unit
    (ref: openaimodel.py:1015-1024,1093,1172; motion_module.py).

Architecture (SD1.5): 320 base channels, mult (1,2,4,4), 2 res blocks/level,
spatial transformers at downsample factors 1/2/4, 8 heads, context dim 768
(ref: models/cldm_v15_reference_only_pose.yaml).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from magicdance_tpu.config import UNetConfig
from magicdance_tpu.models.layers import (
    Downsample,
    GroupNorm32,
    ResBlock,
    SpatialTransformer,
    TemporalTransformer,
    TimestepEmbedMLP,
    Upsample,
    conv3x3,
    nonlinearity,
)
from magicdance_tpu.ops.schedules import timestep_embedding

Bank = Tuple[jax.Array, ...]


def unet_plan(cfg: UNetConfig):
    """Static block plan shared by UNet and the pose ControlNet encoder.

    Returns (enc_units, enc_channels, ds_trace):
      enc_units: list over encoder units of dicts
        {kind: "res"|"down", ch: out_channels, attn: bool, level: int}
      enc_channels: skip-connection channel list (incl. conv_in), length 12
        for SD1.5.
    """
    units = []
    skip_ch = [cfg.model_channels]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = cfg.model_channels * mult
        for _ in range(cfg.num_res_blocks):
            units.append(dict(kind="res", ch=out_ch, attn=ds in cfg.attention_resolutions,
                              level=level, ds=ds))
            ch = out_ch
            skip_ch.append(ch)
        if level != len(cfg.channel_mult) - 1:
            units.append(dict(kind="down", ch=ch, attn=False, level=level, ds=ds))
            ds *= 2
            skip_ch.append(ch)
    return units, skip_ch, ds


def decoder_plan(cfg: UNetConfig):
    """Decoder units in traversal order (deepest level first), with the
    module names the forward pass uses. THE single source of truth for
    decoder bookkeeping: the forward loop, `num_bank_entries` and
    `shallow_plan` all derive from it, so bank ordering can never desync
    from the traversal.

    Each unit: {level, ch, attn, ds, upsample, name_res, name_attn(|None),
    name_mm, name_up(|None)}.
    """
    units = []
    ds = max(1, 2 ** (len(cfg.channel_mult) - 1))
    attn_i = up_i = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            attn = ds in cfg.attention_resolutions
            upsample = level != 0 and i == cfg.num_res_blocks
            idx = len(units)
            units.append(dict(
                level=level,
                ch=cfg.model_channels * cfg.channel_mult[level],
                attn=attn,
                ds=ds,
                upsample=upsample,
                name_res=f"dec_res_{idx}",
                name_attn=f"dec_attn_{attn_i}" if attn else None,
                name_mm=f"dec_motion_{idx}",
                name_up=f"dec_up_{up_i}" if upsample else None,
            ))
            if attn:
                attn_i += 1
            if upsample:
                up_i += 1
        if level != 0:
            ds //= 2
    return units


def num_bank_entries(cfg: UNetConfig) -> int:
    """Bank sites in traversal order: encoder + middle + decoder."""
    enc = sum(1 for u in unet_plan(cfg)[0] if u["attn"])
    dec = sum(1 for u in decoder_plan(cfg) if u["attn"])
    return (enc + 1 + dec) * cfg.transformer_depth


def shallow_plan(cfg: UNetConfig, deep_level: int = 0):
    """Static bookkeeping for the DeepCache shallow pass over levels
    0..deep_level (deep_level=0 is the classic deepest-reuse split; higher
    levels recompute more of the net per step for smaller approximation
    error — "DeepCache", Ma et al. 2023 uses such shallower splits too).

    Returns (n_enc_bank, n_dec_bank): bank entries consumed by the shallow
    levels' encoder/decoder attention sites. (Decoder module names come
    straight from `decoder_plan`, so no name-counter offsets are needed.)
    """
    enc_units, _, _ = unet_plan(cfg)
    n_enc = sum(1 for u in enc_units
                if u["kind"] == "res" and u["attn"]
                and u["level"] <= deep_level)
    n_dec = sum(1 for u in decoder_plan(cfg)
                if u["level"] <= deep_level and u["attn"])
    d = cfg.transformer_depth
    return n_enc * d, n_dec * d


class UNet(nn.Module):
    cfg: UNetConfig

    def _dtype(self):
        return jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array],
        *,
        bank: Optional[Bank] = None,
        collect_bank: bool = False,
        pose_residuals: Optional[Tuple[jax.Array, ...]] = None,
        num_frames: int = 1,
        deterministic: bool = True,
        dtype: jnp.dtype = jnp.bfloat16,
        bank_mask: Optional[jax.Array] = None,
        collect_deep: bool = False,
        deep_cache_in: Optional[jax.Array] = None,
        deep_level: int = 0,
        self_kv_pool: int = 1,
        self_kv_min_seq: int = 4096,
    ):
        """Returns (eps_prediction, bank_written), or
        (eps_prediction, bank_written, deep_feature) when collect_deep.

        x: (B, H, W, C) latents (B = batch*frames when temporal).
        timesteps: (B,) int32.
        context: (B_ctx, 77, context_dim) CLIP states or None (-> zeros ctx is
          the caller's job; reference always passes CLIP("") at minimum).
        bank: tuple of (B_bank, S_i, C_i) appearance entries (B_bank ∈ {1, B}).
        pose_residuals: 13-tuple, [0..11] per-encoder-skip, [12] middle.

        DeepCache (turbo serving): `collect_deep=True` additionally returns
        the hidden state entering the level-0 decoder (post-upsample);
        `deep_cache_in=that_feature` runs a SHALLOW pass — levels
        0..deep_level of the encoder, cached deep feature, levels
        deep_level..0 of the decoder — skipping every deeper level
        ("DeepCache", Ma et al. 2023). `deep_level` picks the split:
        0 = classic deepest reuse (fastest), higher levels recompute more
        per step for smaller approximation error. A shallow pass fed the
        deep feature of the SAME (x, t) reproduces the full forward
        exactly.
        """
        cfg = self.cfg
        assert bank is None or not collect_bank, "write and read are exclusive"
        shallow = deep_cache_in is not None
        assert not (shallow and collect_deep), "collect_deep in a shallow pass"
        assert not (shallow and collect_bank), "bank write in a shallow pass"
        # only constrain deep_level when a DeepCache path actually uses it —
        # a plain forward on a single-level config (channel_mult=(1,)) is
        # valid and never consults the split point
        assert not (shallow or collect_deep) or (
            0 <= deep_level < len(cfg.channel_mult) - 1
        ), (f"deep_level {deep_level} out of range for "
            f"{len(cfg.channel_mult)} levels")
        # rematerialize blocks under autodiff (no-op on forward-only graphs):
        # SD1.5-scale 512^2 training does not fit HBM without it
        if cfg.remat:
            RB = nn.remat(ResBlock)
            # static: collect (4) and kv_pool (6) — both steer Python-level
            # structure inside the transformer
            ST = nn.remat(SpatialTransformer, static_argnums=(4, 6))
            TT = nn.remat(TemporalTransformer)
        else:
            RB, ST, TT = ResBlock, SpatialTransformer, TemporalTransformer
        if bank is not None:
            assert len(bank) == num_bank_entries(cfg), (
                f"bank has {len(bank)} entries, expected {num_bank_entries(cfg)}"
            )
        if shallow:
            n_enc0, n_dec0 = shallow_plan(cfg, deep_level)

        t_emb = timestep_embedding(timesteps, cfg.model_channels, dtype=dtype)
        emb = TimestepEmbedMLP(cfg.model_channels, dtype=dtype, name="time_embed")(t_emb)

        use_mm = cfg.use_motion_modules and num_frames > 1

        bank_written: list[jax.Array] = []
        if bank is not None and shallow:
            # shallow pass touches only the level-0 attention sites: the
            # first n_enc0 entries (encoder) and the last n_dec0 (decoder)
            bank_read = list(bank[:n_enc0]) + (list(bank[-n_dec0:])
                                               if n_dec0 else [])
        else:
            bank_read = list(bank) if bank is not None else None

        def take_bank(n: int):
            if bank_read is None:
                return None
            return tuple(bank_read.pop(0) for _ in range(n))

        def kv_pool_at(h: jax.Array) -> int:
            """Static self-KV pool factor for the attention site at h's
            resolution (opt-in turbo, SampleConfig.self_kv_downsample):
            pools only read/plain sites with >= self_kv_min_seq tokens; the
            appearance WRITE pass stays exact."""
            if (self_kv_pool > 1 and not collect_bank
                    and h.shape[1] * h.shape[2] >= self_kv_min_seq):
                return self_kv_pool
            return 1

        def motion(h, name):
            if not cfg.use_motion_modules:
                return h
            if not use_mm:
                # params must exist even for single-frame calls so the
                # checkpoint layout is frame-count independent
                return TT(
                    num_heads=cfg.motion_num_heads, max_len=cfg.motion_max_len,
                    num_layers=cfg.motion_layers,
                    attns_per_block=cfg.motion_attn_blocks,
                    dtype=dtype, name=name,
                )(h[:, None])[:, 0]
            b2, hh, ww, c = h.shape
            hv = h.reshape(b2 // num_frames, num_frames, hh, ww, c)
            hv = TT(
                num_heads=cfg.motion_num_heads, max_len=cfg.motion_max_len,
                num_layers=cfg.motion_layers,
                attns_per_block=cfg.motion_attn_blocks,
                dtype=dtype, name=name,
            )(hv)
            return hv.reshape(b2, hh, ww, c)

        x = x.astype(dtype)
        if context is not None:
            context = context.astype(dtype)

        # --- encoder -------------------------------------------------------
        units, _, final_ds = unet_plan(cfg)
        h = conv3x3(cfg.model_channels, dtype=dtype, name="conv_in")(x)
        hs = [h]
        res_i = down_i = attn_i = mm_i = 0
        for u in units:
            if shallow and (u["level"] > deep_level
                            or (u["kind"] == "down"
                                and u["level"] == deep_level)):
                break  # deeper levels are served from the cache
            if u["kind"] == "res":
                h = RB(u["ch"], dropout=cfg.dropout, dtype=dtype,
                             name=f"enc_res_{res_i}")(h, emb, deterministic=deterministic)
                res_i += 1
                if u["attn"]:
                    head_dim = u["ch"] // cfg.num_heads
                    h, written = ST(
                        num_heads=cfg.num_heads, head_dim=head_dim,
                        depth=cfg.transformer_depth, dtype=dtype,
                        name=f"enc_attn_{attn_i}",
                    )(h, context, take_bank(cfg.transformer_depth),
                      collect_bank, bank_mask, kv_pool_at(h))
                    attn_i += 1
                    bank_written.extend(written)
                h = motion(h, f"enc_motion_{mm_i}")
                mm_i += 1
                hs.append(h)
            else:
                h = Downsample(u["ch"], dtype=dtype, name=f"enc_down_{down_i}")(h)
                down_i += 1
                hs.append(h)

        # --- middle --------------------------------------------------------
        if not shallow:
            mid_ch = cfg.model_channels * cfg.channel_mult[-1]
            h = RB(mid_ch, dropout=cfg.dropout, dtype=dtype, name="mid_res_0")(
                h, emb, deterministic=deterministic)
            h, written = ST(
                num_heads=cfg.num_heads, head_dim=mid_ch // cfg.num_heads,
                depth=cfg.transformer_depth, dtype=dtype, name="mid_attn",
            )(h, context, take_bank(cfg.transformer_depth), collect_bank,
              bank_mask, kv_pool_at(h))
            bank_written.extend(written)
            h = RB(mid_ch, dropout=cfg.dropout, dtype=dtype, name="mid_res_1")(
                h, emb, deterministic=deterministic)

            if pose_residuals is not None:
                h = h + pose_residuals[-1].astype(h.dtype)

        # --- decoder -------------------------------------------------------
        # one enumeration (decoder_plan) drives the loop; the shallow pass
        # keeps only the level-0 units, whose names are identical to the
        # full pass by construction, so parameters always match
        deep_feature = None
        dec_units = decoder_plan(cfg)
        if shallow:
            # cached hidden state entering the level-(deep_level) decoder
            h = deep_cache_in.astype(dtype)
            dec_units = [u for u in dec_units if u["level"] <= deep_level]
        seen_cache_point = False
        for u in dec_units:
            out_ch = u["ch"]
            if u["level"] == deep_level and not seen_cache_point:
                seen_cache_point = True
                if not shallow:
                    deep_feature = h
            skip = hs.pop()
            if pose_residuals is not None:
                skip = skip + pose_residuals[len(hs)].astype(skip.dtype)
            h = jnp.concatenate([h, skip], axis=-1)
            h = RB(out_ch, dropout=cfg.dropout, dtype=dtype,
                         name=u["name_res"])(h, emb, deterministic=deterministic)
            if u["attn"]:
                h, written = ST(
                    num_heads=cfg.num_heads, head_dim=out_ch // cfg.num_heads,
                    depth=cfg.transformer_depth, dtype=dtype,
                    name=u["name_attn"],
                )(h, context, take_bank(cfg.transformer_depth),
                  collect_bank, bank_mask, kv_pool_at(h))
                bank_written.extend(written)
            h = motion(h, u["name_mm"])
            if u["upsample"]:
                h = Upsample(out_ch, dtype=dtype, name=u["name_up"])(h)
        assert not hs, "skip bookkeeping mismatch"
        if bank_read is not None:
            assert not bank_read, "unconsumed bank entries"

        h = GroupNorm32(name="norm_out", act=True)(h)
        h = conv3x3(cfg.out_channels, dtype=dtype, name="conv_out", zero_init=True)(h)
        if collect_deep:
            return h.astype(jnp.float32), tuple(bank_written), deep_feature
        return h.astype(jnp.float32), tuple(bank_written)
