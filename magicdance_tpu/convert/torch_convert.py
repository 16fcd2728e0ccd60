"""PyTorch reference checkpoints → JAX pytrees.

The parity bridge (SURVEY.md §7 "Checkpoints"): maps the key spaces of the
reference checkpoints — `model_state-{step}.th` (full
ControlLDMReferenceOnlyPose state dict), `control_sd15_ini.ckpt`,
`control_v11p_sd15_openpose.pth`, plain SD1.5 `.ckpt` — onto the Flax
module trees in `magicdance_tpu.models`, including the reference's
checkpoint-surgery rules (`control_model` → `appearance_control_model` /
`pose_control_model` renames, ref train_tiktok.py:128-210; SD-decoder →
appearance-decoder copy for reference-only init, train_tiktok.py:94-102).

Weight-layout transforms:
  torch Conv2d  OIHW  → flax nn.Conv  HWIO
  torch Linear  (out,in) → flax nn.Dense (in,out)
  torch GroupNorm/LayerNorm weight/bias → flax scale/bias
  torch Embedding → flax nn.Embed.embedding

Torch key anatomy (standard LDM/openai-UNet naming, e.g.
ldm/modules/diffusionmodules/openaimodel.py): input_blocks.{i}.{j} where
j=0 is the ResBlock (in_layers.0 GN, in_layers.2 conv, emb_layers.1,
out_layers.0 GN, out_layers.3 conv, skip_connection) and j=1 the
SpatialTransformer (norm, proj_in, transformer_blocks.{d}.attn1/attn2.
to_q/to_k/to_v/to_out.0, ff.net.0.proj, ff.net.2, norm1..3, proj_out);
downsamples are input_blocks.{i}.0.op; out.0/out.2 is the head. The
ControlNet adds input_hint_block.{0,2,..,14}, zero_convs.{i}.0 and
middle_block_out.0 (ref cldm.py:597-615,730).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from magicdance_tpu.config import (
    CLIPTextConfig,
    ControlNetConfig,
    ModelConfig,
    UNetConfig,
    VAEConfig,
)
from magicdance_tpu.models.unet import unet_plan


Flat = Dict[tuple, np.ndarray]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to a flat {key: ndarray} dict.

    Handles the reference's container layouts: raw state dicts,
    {"state_dict": ...} (.ckpt), and optimizer files are rejected.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"unsupported checkpoint container in {path}")
    return {k: _np(v) for k, v in obj.items() if hasattr(v, "shape")}


# ---------------------------------------------------------------------------
# elementary transforms
# ---------------------------------------------------------------------------

def _conv(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _linear(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(sd[f"{key}.weight"], (1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _norm(sd, key) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _gn32(sd, key) -> Dict[str, Any]:
    # our GroupNorm32 wrapper holds the params under a child named "norm"
    return {"norm": _norm(sd, key)}


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _resblock(sd, p, has_skip: bool) -> Dict[str, Any]:
    out = {
        "norm_in": _gn32(sd, f"{p}.in_layers.0"),
        "conv_in": _conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _linear(sd, f"{p}.emb_layers.1"),
        "norm_out": _gn32(sd, f"{p}.out_layers.0"),
        "conv_out": _conv(sd, f"{p}.out_layers.3"),
    }
    if has_skip:
        out["skip"] = _conv(sd, f"{p}.skip_connection")
    return out


def _transformer_block(sd, p) -> Dict[str, Any]:
    def attn(q):
        return {
            "to_q": _linear(sd, f"{q}.to_q"),
            "to_k": _linear(sd, f"{q}.to_k"),
            "to_v": _linear(sd, f"{q}.to_v"),
            "to_out": _linear(sd, f"{q}.to_out.0"),
        }

    return {
        "attn1": attn(f"{p}.attn1"),
        "attn2": attn(f"{p}.attn2"),
        "ff": {
            "proj_in": _linear(sd, f"{p}.ff.net.0.proj"),
            "proj_out": _linear(sd, f"{p}.ff.net.2"),
        },
        "norm1": _norm(sd, f"{p}.norm1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "norm3": _norm(sd, f"{p}.norm3"),
    }


def _spatial_transformer(sd, p, depth: int) -> Dict[str, Any]:
    out = {
        "norm": _gn32(sd, f"{p}.norm"),
        "proj_in": _conv(sd, f"{p}.proj_in"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        out[f"block_{d}"] = _transformer_block(sd, f"{p}.transformer_blocks.{d}")
    return out


def convert_unet(sd: Mapping[str, np.ndarray], prefix: str, cfg: UNetConfig) -> Dict[str, Any]:
    """Map `{prefix}.*` UNet keys onto the magicdance UNet module tree.

    Handles both the main UNet (`model.diffusion_model`) and the appearance
    branch (`appearance_control_model` — same architecture; its unused
    input_hint_block keys are ignored, ref cldm.py:474-483).
    """
    p = prefix.rstrip(".")
    out: Dict[str, Any] = {
        "time_embed": {
            "fc1": _linear(sd, f"{p}.time_embed.0"),
            "fc2": _linear(sd, f"{p}.time_embed.2"),
        },
        "conv_in": _conv(sd, f"{p}.input_blocks.0.0"),
    }

    units, _, final_ds = unet_plan(cfg)
    # encoder
    tb = 1  # torch input_blocks index (0 is conv_in)
    res_i = attn_i = down_i = 0
    in_ch = cfg.model_channels
    for u in units:
        if u["kind"] == "res":
            out[f"enc_res_{res_i}"] = _resblock(
                sd, f"{p}.input_blocks.{tb}.0", has_skip=(in_ch != u["ch"])
            )
            in_ch = u["ch"]
            if u["attn"]:
                out[f"enc_attn_{attn_i}"] = _spatial_transformer(
                    sd, f"{p}.input_blocks.{tb}.1", cfg.transformer_depth
                )
                attn_i += 1
            res_i += 1
        else:
            out[f"enc_down_{down_i}"] = {"conv": _conv(sd, f"{p}.input_blocks.{tb}.0.op")}
            down_i += 1
        tb += 1

    # middle
    out["mid_res_0"] = _resblock(sd, f"{p}.middle_block.0", has_skip=False)
    out["mid_attn"] = _spatial_transformer(sd, f"{p}.middle_block.1", cfg.transformer_depth)
    out["mid_res_1"] = _resblock(sd, f"{p}.middle_block.2", has_skip=False)

    # decoder — all res blocks concat a skip, so skip_connection always exists
    ds = final_ds
    dec_i = dattn_i = up_i = 0
    tb = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            out[f"dec_res_{dec_i}"] = _resblock(
                sd, f"{p}.output_blocks.{tb}.0", has_skip=True
            )
            dec_i += 1
            j = 1
            if ds in cfg.attention_resolutions:
                out[f"dec_attn_{dattn_i}"] = _spatial_transformer(
                    sd, f"{p}.output_blocks.{tb}.{j}", cfg.transformer_depth
                )
                dattn_i += 1
                j += 1
            if level != 0 and i == cfg.num_res_blocks:
                out[f"dec_up_{up_i}"] = {
                    "conv": _conv(sd, f"{p}.output_blocks.{tb}.{j}.conv")
                }
                up_i += 1
                ds //= 2
            tb += 1

    out["norm_out"] = _gn32(sd, f"{p}.out.0")
    out["conv_out"] = _conv(sd, f"{p}.out.2")
    return out


# ---------------------------------------------------------------------------
# Pose ControlNet
# ---------------------------------------------------------------------------

def convert_controlnet(
    sd: Mapping[str, np.ndarray], prefix: str, cfg: ControlNetConfig
) -> Dict[str, Any]:
    """Map ControlNet keys (`pose_control_model` / `control_model`) onto
    PoseControlNet (ref cldm.py:500-757)."""
    p = prefix.rstrip(".")
    ucfg = UNetConfig(
        model_channels=cfg.model_channels,
        channel_mult=cfg.channel_mult,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions,
        num_heads=cfg.num_heads,
        transformer_depth=cfg.transformer_depth,
        context_dim=cfg.context_dim,
    )
    out: Dict[str, Any] = {
        "time_embed": {
            "fc1": _linear(sd, f"{p}.time_embed.0"),
            "fc2": _linear(sd, f"{p}.time_embed.2"),
        },
        "conv_in": _conv(sd, f"{p}.input_blocks.0.0"),
    }
    # hint CNN: torch indices 0,2,4,...,14 (SiLU between), ours conv_0..6 +
    # conv_out (zero-init final)
    hint = {}
    for i in range(7):
        hint[f"conv_{i}"] = _conv(sd, f"{p}.input_hint_block.{2 * i}")
    hint["conv_out"] = _conv(sd, f"{p}.input_hint_block.14")
    out["hint_encoder"] = hint

    units, _, _ = unet_plan(ucfg)
    tb = 1
    res_i = attn_i = down_i = 0
    in_ch = cfg.model_channels
    for u in units:
        if u["kind"] == "res":
            out[f"enc_res_{res_i}"] = _resblock(
                sd, f"{p}.input_blocks.{tb}.0", has_skip=(in_ch != u["ch"])
            )
            in_ch = u["ch"]
            if u["attn"]:
                out[f"enc_attn_{attn_i}"] = _spatial_transformer(
                    sd, f"{p}.input_blocks.{tb}.1", cfg.transformer_depth
                )
                attn_i += 1
            res_i += 1
        else:
            out[f"enc_down_{down_i}"] = {"conv": _conv(sd, f"{p}.input_blocks.{tb}.0.op")}
            down_i += 1
        tb += 1

    out["mid_res_0"] = _resblock(sd, f"{p}.middle_block.0", has_skip=False)
    out["mid_attn"] = _spatial_transformer(sd, f"{p}.middle_block.1", cfg.transformer_depth)
    out["mid_res_1"] = _resblock(sd, f"{p}.middle_block.2", has_skip=False)

    for i in range(len(units) + 1):
        out[f"zero_conv_{i}"] = _conv(sd, f"{p}.zero_convs.{i}.0")
    out["zero_conv_mid"] = _conv(sd, f"{p}.middle_block_out.0")
    return out


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_resblock(sd, p, has_shortcut: bool) -> Dict[str, Any]:
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if has_shortcut:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _vae_attn(sd, p) -> Dict[str, Any]:
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_vae(
    sd: Mapping[str, np.ndarray], prefix: str, cfg: VAEConfig
) -> Dict[str, Any]:
    """Map `first_stage_model.*` onto AutoencoderKL
    (ref ldm/models/autoencoder.py, modules/diffusionmodules/model.py)."""
    p = prefix.rstrip(".")
    enc: Dict[str, Any] = {"conv_in": _conv(sd, f"{p}.encoder.conv_in")}
    ch = cfg.base_channels
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = cfg.base_channels * mult
        for b in range(cfg.num_res_blocks):
            enc[f"down_{level}_block_{b}"] = _vae_resblock(
                sd, f"{p}.encoder.down.{level}.block.{b}", has_shortcut=(ch != out_ch)
            )
            ch = out_ch
        if level != len(cfg.channel_mult) - 1:
            enc[f"down_{level}_downsample"] = {
                "conv": _conv(sd, f"{p}.encoder.down.{level}.downsample.conv")
            }
    enc["mid_block_1"] = _vae_resblock(sd, f"{p}.encoder.mid.block_1", False)
    enc["mid_attn_1"] = _vae_attn(sd, f"{p}.encoder.mid.attn_1")
    enc["mid_block_2"] = _vae_resblock(sd, f"{p}.encoder.mid.block_2", False)
    enc["norm_out"] = _norm(sd, f"{p}.encoder.norm_out")
    enc["conv_out"] = _conv(sd, f"{p}.encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, f"{p}.decoder.conv_in")}
    dec["mid_block_1"] = _vae_resblock(sd, f"{p}.decoder.mid.block_1", False)
    dec["mid_attn_1"] = _vae_attn(sd, f"{p}.decoder.mid.attn_1")
    dec["mid_block_2"] = _vae_resblock(sd, f"{p}.decoder.mid.block_2", False)
    ch = cfg.base_channels * cfg.channel_mult[-1]
    for level in reversed(range(len(cfg.channel_mult))):
        out_ch = cfg.base_channels * cfg.channel_mult[level]
        for b in range(cfg.num_res_blocks + 1):
            dec[f"up_{level}_block_{b}"] = _vae_resblock(
                sd, f"{p}.decoder.up.{level}.block.{b}", has_shortcut=(ch != out_ch)
            )
            ch = out_ch
        if level != 0:
            dec[f"up_{level}_upsample"] = {
                "conv": _conv(sd, f"{p}.decoder.up.{level}.upsample.conv")
            }
    dec["norm_out"] = _norm(sd, f"{p}.decoder.norm_out")
    dec["conv_out"] = _conv(sd, f"{p}.decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, f"{p}.quant_conv"),
        "post_quant_conv": _conv(sd, f"{p}.post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def convert_clip_text(
    sd: Mapping[str, np.ndarray], prefix: str, cfg: CLIPTextConfig
) -> Dict[str, Any]:
    """Map HF CLIPTextModel keys (`cond_stage_model.transformer.*`) onto
    CLIPTextEncoder (ref encoders/modules.py:88 FrozenCLIPEmbedder)."""
    p = prefix.rstrip(".")
    join = (lambda s: f"{p}.{s}") if p else (lambda s: s)
    tm = join("text_model") if f"{join('text_model')}.final_layer_norm.weight" in sd else p
    out: Dict[str, Any] = {
        "token_embedding": {"embedding": sd[f"{tm}.embeddings.token_embedding.weight"]},
        "position_embedding": sd[f"{tm}.embeddings.position_embedding.weight"],
        "final_layer_norm": _norm(sd, f"{tm}.final_layer_norm"),
    }
    for i in range(cfg.num_layers):
        lp = f"{tm}.encoder.layers.{i}"
        out[f"layer_{i}"] = {
            "self_attn": {
                "q_proj": _linear(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{lp}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
            },
            "layer_norm1": _norm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{lp}.layer_norm2"),
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": _linear(sd, f"{lp}.mlp.fc2"),
        }
    return out


# ---------------------------------------------------------------------------
# full checkpoints incl. reference surgery rules
# ---------------------------------------------------------------------------

def convert_magicpose_state(
    sd: Mapping[str, np.ndarray], cfg: ModelConfig
) -> Dict[str, Any]:
    """Full `model_state-*.th` → {"model", "vae", "clip"} param trees.

    Applies the reference's key-surgery semantics when older layouts are
    given (train_tiktok.py:128-271):
      * `control_model.*` present but no `appearance_control_model.*`
        (control_sd15_ini.ckpt layout) → control_model initializes BOTH the
        appearance branch (full copy incl. decoder, with the SD UNet decoder
        completing the missing up blocks) and the pose branch.
    """
    keys = sd.keys()
    has_appearance_keys = any(k.startswith("appearance_control_model.") for k in keys)
    has_pose_keys = any(k.startswith("pose_control_model.") for k in keys)
    has_legacy_control = any(k.startswith("control_model.") for k in keys)

    model: Dict[str, Any] = {
        "unet": convert_unet(sd, "model.diffusion_model", cfg.unet)
    }

    from magicdance_tpu.models.magicpose import appearance_unet_config

    if cfg.has_appearance:
        if has_appearance_keys:
            model["appearance_unet"] = convert_unet(
                sd, "appearance_control_model", appearance_unet_config(cfg)
            )
        elif has_legacy_control:
            # surgery: encoder from control_model, decoder completed from the
            # SD UNet (train_tiktok.py:94-102, 236-249)
            merged = dict(sd)
            for k in list(sd.keys()):
                if k.startswith("model.diffusion_model.output_blocks") or k.startswith(
                    "model.diffusion_model.out."
                ):
                    merged[k.replace("model.diffusion_model", "control_model")] = sd[k]
            model["appearance_unet"] = convert_unet(
                merged, "control_model", appearance_unet_config(cfg)
            )
        else:
            raise KeyError("no appearance/control keys in checkpoint")

    if cfg.has_pose:
        if has_pose_keys:
            model["pose_control"] = convert_controlnet(
                sd, "pose_control_model", cfg.pose_control
            )
        elif has_legacy_control:
            model["pose_control"] = convert_controlnet(
                sd, "control_model", cfg.pose_control
            )
        else:
            raise KeyError("no pose/control keys in checkpoint")

    out = {"model": {"params": model}}
    if any(k.startswith("first_stage_model.") for k in keys):
        out["vae"] = {"params": convert_vae(sd, "first_stage_model", cfg.vae)}
    if any(k.startswith("cond_stage_model.transformer.") for k in keys):
        out["clip"] = {
            "params": convert_clip_text(sd, "cond_stage_model.transformer", cfg.clip)
        }
    return out


def _motion_module(sd, p, layers: int, attns: int) -> Dict[str, Any]:
    """One VanillaTemporalModule (`{p}.temporal_transformer.*`) → our
    TemporalTransformer tree (ref motion_module.py:86-209). The pos_encoder
    `pe` buffer is not converted — it is a deterministic sinusoid our module
    recomputes (motion_module.py:227-241)."""
    tt = f"{p}.temporal_transformer"
    out: Dict[str, Any] = {
        "norm": _gn32(sd, f"{tt}.norm"),
        "proj_in": _linear(sd, f"{tt}.proj_in"),
        "proj_out": _linear(sd, f"{tt}.proj_out"),
    }
    for i in range(layers):
        b = f"{tt}.transformer_blocks.{i}"
        for j in range(attns):
            a = f"{b}.attention_blocks.{j}"
            out[f"attn_{i}_{j}"] = {
                "to_q": _linear(sd, f"{a}.to_q"),
                "to_k": _linear(sd, f"{a}.to_k"),
                "to_v": _linear(sd, f"{a}.to_v"),
                "to_out": _linear(sd, f"{a}.to_out.0"),
            }
            out[f"norm_attn_{i}_{j}"] = _norm(sd, f"{b}.norms.{j}")
        out[f"norm_ff_{i}"] = _norm(sd, f"{b}.ff_norm")
        out[f"ff_{i}"] = {
            "proj_in": _linear(sd, f"{b}.ff.net.0.proj"),
            "proj_out": _linear(sd, f"{b}.ff.net.2"),
        }
    return out


def convert_motion_modules(
    sd: Mapping[str, np.ndarray], cfg: UNetConfig
) -> Dict[str, Any]:
    """AnimateDiff motion-module checkpoint → {enc_motion_k, dec_motion_k}.

    Implements the reference's `merge_state_dict_mm` key remap
    (train_tiktok.py:146-192): public AnimateDiff checkpoints (mm_sd_v15
    layout) store modules as `down_blocks.{i}.motion_modules.{j}` /
    `up_blocks.{i}.motion_modules.{j}`, mapped to
    `input_blocks_motion_module.{i*R+j}` / `output_blocks_motion_module.
    {i*(R+1)+j}` with R = num_res_blocks (the reference hardcodes R=2).
    Mid-block motion modules, when present, are skipped exactly as the
    reference skips them. Checkpoints already in the reference's own
    `*_blocks_motion_module.{k}.0` layout are accepted too.
    """
    layers = cfg.motion_layers
    attns = cfg.motion_attn_blocks
    out: Dict[str, Any] = {}
    keys = list(sd.keys())
    is_animatediff = any(".motion_modules." in k for k in keys)
    if is_animatediff:
        R = cfg.num_res_blocks
        for i in range(len(cfg.channel_mult)):
            for j in range(R):
                p = f"down_blocks.{i}.motion_modules.{j}"
                if any(k.startswith(p) for k in keys):
                    out[f"enc_motion_{i * R + j}"] = _motion_module(
                        sd, p, layers, attns)
            for j in range(R + 1):
                p = f"up_blocks.{i}.motion_modules.{j}"
                if any(k.startswith(p) for k in keys):
                    out[f"dec_motion_{i * (R + 1) + j}"] = _motion_module(
                        sd, p, layers, attns)
    else:
        n_enc = sum(1 for u in unet_plan(cfg)[0] if u["kind"] == "res")
        n_dec = (cfg.num_res_blocks + 1) * len(cfg.channel_mult)
        for k_idx in range(n_enc):
            p = f"model.diffusion_model.input_blocks_motion_module.{k_idx}.0"
            if not any(k.startswith(p) for k in keys):
                p = f"input_blocks_motion_module.{k_idx}.0"
            if any(k.startswith(p) for k in keys):
                out[f"enc_motion_{k_idx}"] = _motion_module(sd, p, layers, attns)
        for k_idx in range(n_dec):
            p = f"model.diffusion_model.output_blocks_motion_module.{k_idx}.0"
            if not any(k.startswith(p) for k in keys):
                p = f"output_blocks_motion_module.{k_idx}.0"
            if any(k.startswith(p) for k in keys):
                out[f"dec_motion_{k_idx}"] = _motion_module(sd, p, layers, attns)
    if not out:
        raise KeyError("no motion-module keys found in checkpoint")
    return out


def merge_motion_state(
    unet_tree: Dict[str, Any], mm_tree: Dict[str, Any]
) -> Dict[str, Any]:
    """Overlay converted motion modules onto a UNet param tree (the
    `merge_state_dict_mm` merge step, ref train_tiktok.py:146): the temporal
    UNet initialized from an image checkpoint + AnimateDiff motion weights."""
    merged = dict(unet_tree)
    for name, sub in mm_tree.items():
        if name in merged:
            cur = dict(merged[name])
            cur.update(sub)
            merged[name] = cur
        else:
            merged[name] = sub
    return merged


def expand_conv_in(unet_tree: Dict[str, Any], new_in_channels: int) -> Dict[str, Any]:
    """Zero-pad the UNet input conv for extra conditioning channels — the
    mask-variant first-conv surgery (ref train_tiktok.py:251-271: weights for
    the added channels start at zero so the pretrained 4-channel behavior is
    preserved)."""
    k = unet_tree["conv_in"]["kernel"]  # (3, 3, in, out)
    cur = k.shape[2]
    if new_in_channels < cur:
        raise ValueError(f"cannot shrink conv_in {cur} -> {new_in_channels}")
    if new_in_channels > cur:
        pad = np.zeros(k.shape[:2] + (new_in_channels - cur, k.shape[3]),
                       k.dtype)
        unet_tree = dict(unet_tree)
        unet_tree["conv_in"] = dict(unet_tree["conv_in"])
        unet_tree["conv_in"]["kernel"] = np.concatenate([k, pad], axis=2)
    return unet_tree


def to_jax(tree, dtype=None):
    import jax.numpy as jnp

    def leaf(x):
        a = jnp.asarray(x)
        return a.astype(dtype) if dtype is not None and a.dtype == jnp.float32 else a

    import jax

    return jax.tree.map(leaf, tree)
