"""Checkpoint-converter parity tests (SURVEY.md §4 implication (c)): a
key-compatible torch oracle (tests/torch_ref.py) generates reference-format
state dicts; converting them into the Flax modules must reproduce the torch
forward numerically (fp32 tolerance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from magicdance_tpu.config import (
    CLIPTextConfig,
    ControlNetConfig,
    UNetConfig,
)
from magicdance_tpu.convert.torch_convert import (
    convert_clip_text,
    convert_controlnet,
    convert_unet,
)
from magicdance_tpu.models.controlnet import PoseControlNet
from magicdance_tpu.models.unet import UNet

from torch_ref import TorchControlNet, TorchUNet

TINY = dict(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1, 2), num_heads=2, context_dim=16)


def prefixed_state(module: torch.nn.Module, prefix: str):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in module.state_dict().items()}


def tree_shapes(tree):
    from flax import traverse_util

    return {k: tuple(v.shape) for k, v in traverse_util.flatten_dict(tree).items()}


@pytest.fixture(scope="module")
def torch_unet():
    torch.manual_seed(0)
    m = TorchUNet(**{k: v for k, v in TINY.items() if k != "num_heads"},
                  heads=TINY["num_heads"])
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_unet_cfg():
    return UNetConfig(**TINY)


def test_unet_conversion_structure(torch_unet, flax_unet_cfg):
    sd = prefixed_state(torch_unet, "model.diffusion_model")
    converted = convert_unet(sd, "model.diffusion_model", flax_unet_cfg)

    model = UNet(flax_unet_cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                      jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 16)))
    a, b = tree_shapes(init["params"]), tree_shapes(converted)
    assert set(a) == set(b), (
        f"missing={sorted(set(a) - set(b))[:5]} extra={sorted(set(b) - set(a))[:5]}"
    )
    for k in a:
        assert a[k] == b[k], f"shape mismatch at {k}: {a[k]} vs {b[k]}"


def test_unet_forward_parity(torch_unet, flax_unet_cfg):
    sd = prefixed_state(torch_unet, "model.diffusion_model")
    params = {"params": jax.tree.map(jnp.asarray,
                                     convert_unet(sd, "model.diffusion_model",
                                                  flax_unet_cfg))}
    model = UNet(flax_unet_cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    t = np.array([3, 711], dtype=np.int64)
    ctx = rng.randn(2, 5, 16).astype(np.float32)

    with torch.no_grad():
        ref = torch_unet(torch.from_numpy(x).permute(0, 3, 1, 2),
                         torch.from_numpy(t), torch.from_numpy(ctx))
    ref = ref.permute(0, 2, 3, 1).numpy()

    out, _ = model.apply(params, jnp.asarray(x), jnp.asarray(t),
                         jnp.asarray(ctx), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_unet_bank_write_read_parity(torch_unet, flax_unet_cfg):
    """The whole appearance mechanism, cross-framework: torch writes a bank,
    both sides read it, outputs must match."""
    sd = prefixed_state(torch_unet, "model.diffusion_model")
    params = {"params": jax.tree.map(jnp.asarray,
                                     convert_unet(sd, "model.diffusion_model",
                                                  flax_unet_cfg))}
    model = UNet(flax_unet_cfg)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    ref_img = rng.randn(1, 8, 8, 4).astype(np.float32)
    t = np.array([25], dtype=np.int64)
    ctx = rng.randn(1, 5, 16).astype(np.float32)

    with torch.no_grad():
        _, tbank = torch_unet(torch.from_numpy(ref_img).permute(0, 3, 1, 2),
                              torch.from_numpy(t), torch.from_numpy(ctx),
                              collect_bank=True)
        tref = torch_unet(torch.from_numpy(x).permute(0, 3, 1, 2),
                          torch.from_numpy(t), torch.from_numpy(ctx),
                          bank=tbank)
    tref = tref.permute(0, 2, 3, 1).numpy()

    _, jbank = model.apply(params, jnp.asarray(ref_img), jnp.asarray(t),
                           jnp.asarray(ctx), collect_bank=True,
                           dtype=jnp.float32)
    # bank entries themselves must match
    assert len(jbank) == len(tbank)
    for je, te in zip(jbank, tbank):
        np.testing.assert_allclose(np.asarray(je), te.numpy(), atol=2e-4,
                                   rtol=2e-4)
    out, _ = model.apply(params, jnp.asarray(x), jnp.asarray(t),
                         jnp.asarray(ctx), bank=jbank, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), tref, atol=5e-4, rtol=5e-4)


def test_controlnet_conversion_and_parity():
    torch.manual_seed(1)
    tcn = TorchControlNet(**{k: v for k, v in TINY.items() if k != "num_heads"},
                          heads=TINY["num_heads"])
    tcn.eval()
    sd = prefixed_state(tcn, "control_model")
    ccfg = ControlNetConfig(**TINY)
    params = {"params": jax.tree.map(jnp.asarray,
                                     convert_controlnet(sd, "control_model", ccfg))}
    model = PoseControlNet(ccfg)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    hint = rng.rand(1, 64, 64, 3).astype(np.float32)
    t = np.array([123], dtype=np.int64)
    ctx = rng.randn(1, 5, 16).astype(np.float32)

    with torch.no_grad():
        refs = tcn(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(hint).permute(0, 3, 1, 2),
                   torch.from_numpy(t), torch.from_numpy(ctx))
    outs = model.apply(params, jnp.asarray(x), jnp.asarray(hint),
                       jnp.asarray(t), jnp.asarray(ctx), dtype=jnp.float32)
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o),
                                   r.permute(0, 2, 3, 1).numpy(),
                                   atol=2e-4, rtol=2e-4)


def test_unet_pose_residual_parity(torch_unet, flax_unet_cfg):
    """Residual injection points (middle + each decoder skip) line up."""
    sd = prefixed_state(torch_unet, "model.diffusion_model")
    params = {"params": jax.tree.map(jnp.asarray,
                                     convert_unet(sd, "model.diffusion_model",
                                                  flax_unet_cfg))}
    model = UNet(flax_unet_cfg)
    rng = np.random.RandomState(3)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    t = np.array([47], dtype=np.int64)
    ctx = rng.randn(1, 5, 16).astype(np.float32)
    # residual shapes: skips then middle (tiny cfg: 5 tensors)
    shapes = [(1, 8, 8, 32), (1, 8, 8, 32), (1, 4, 4, 32), (1, 4, 4, 64),
              (1, 4, 4, 64)]
    res = [rng.randn(*s).astype(np.float32) * 0.1 for s in shapes]

    with torch.no_grad():
        ref = torch_unet(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(ctx),
            pose_residuals=[torch.from_numpy(r).permute(0, 3, 1, 2) for r in res],
        )
    out, _ = model.apply(params, jnp.asarray(x), jnp.asarray(t),
                         jnp.asarray(ctx),
                         pose_residuals=tuple(jnp.asarray(r) for r in res),
                         dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=5e-4, rtol=5e-4)


def test_clip_conversion_parity():
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    hf_cfg = HFConfig(vocab_size=99, hidden_size=32, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=10)
    torch.manual_seed(3)
    hf = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPTextConfig(vocab_size=99, hidden_size=32, num_layers=2,
                         num_heads=4, max_length=10)
    from magicdance_tpu.models.clip import CLIPTextEncoder

    params = {"params": jax.tree.map(jnp.asarray, convert_clip_text(sd, "", cfg))}
    model = CLIPTextEncoder(cfg)

    ids = np.array([[1, 5, 7, 2, 0, 0, 0, 0, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    out = model.apply(params, jnp.asarray(ids, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_vae_conversion_parity():
    from magicdance_tpu.config import VAEConfig
    from magicdance_tpu.convert.torch_convert import convert_vae
    from magicdance_tpu.models.vae import AutoencoderKL

    from torch_ref import TorchVAE

    torch.manual_seed(5)
    tvae = TorchVAE(base=32, mult=(1, 2), zc=4).eval()
    sd = {f"first_stage_model.{k}": v.detach().numpy()
          for k, v in tvae.state_dict().items()}
    cfg = VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1)
    params = {"params": jax.tree.map(jnp.asarray,
                                     convert_vae(sd, "first_stage_model", cfg))}
    vae = AutoencoderKL(cfg)

    rng = np.random.RandomState(4)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        moments_ref = tvae.encode_moments(
            torch.from_numpy(x).permute(0, 3, 1, 2))
    post = vae.apply(params, jnp.asarray(x), method=vae.encode)
    mean_ref, logvar_ref = moments_ref.chunk(2, dim=1)
    np.testing.assert_allclose(np.asarray(post.mean),
                               mean_ref.permute(0, 2, 3, 1).numpy(),
                               atol=3e-4, rtol=3e-4)

    z = rng.randn(1, 16, 16, 4).astype(np.float32)
    with torch.no_grad():
        dec_ref = tvae.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
    dec = vae.apply(params, jnp.asarray(z), method=vae.decode)
    np.testing.assert_allclose(np.asarray(dec),
                               dec_ref.permute(0, 2, 3, 1).numpy(),
                               atol=5e-4, rtol=5e-4)


def test_motion_module_conversion_parity():
    """AnimateDiff mm-layout keys -> TemporalTransformer params reproduce the
    torch forward (the merge_state_dict_mm capability,
    ref train_tiktok.py:146-192)."""
    from magicdance_tpu.convert.torch_convert import (
        convert_motion_modules,
        merge_motion_state,
    )
    from magicdance_tpu.models.layers import TemporalTransformer
    from torch_ref import TorchMotionModule

    torch.manual_seed(1)
    c, heads, f, hw, b = 64, 2, 4, 8, 2
    mod = TorchMotionModule(c, heads, layers=1, attns=2)
    mod.eval()

    sd = prefixed_state(mod, "down_blocks.0.motion_modules.0")
    cfg = UNetConfig(**TINY, use_motion_modules=True, motion_num_heads=heads)
    tree = convert_motion_modules(sd, cfg)
    assert list(tree.keys()) == ["enc_motion_0"]

    tt = TemporalTransformer(num_heads=heads, num_layers=1, attns_per_block=2,
                             dtype=jnp.float32)
    x = np.random.RandomState(0).randn(b, f, hw, hw, c).astype(np.float32)
    out_jax = tt.apply({"params": tree["enc_motion_0"]}, jnp.asarray(x))

    xt = torch.tensor(
        x.transpose(0, 1, 4, 2, 3).reshape(b * f, c, hw, hw))
    with torch.no_grad():
        out_t = mod(xt, video_length=f)
    out_t = (out_t.reshape(b, f, c, hw, hw).permute(0, 1, 3, 4, 2)
             .numpy())
    np.testing.assert_allclose(np.asarray(out_jax), out_t,
                               atol=2e-4, rtol=2e-4)


def test_motion_module_site_mapping():
    """down (i,j) -> enc_motion_{i*R+j}; up (i,j) -> dec_motion_{i*(R+1)+j};
    mid_block modules skipped; ref-native *_blocks_motion_module layout also
    accepted (ref train_tiktok.py:146-192)."""
    from magicdance_tpu.convert.torch_convert import (
        convert_motion_modules,
        merge_motion_state,
    )
    from torch_ref import TorchMotionModule

    torch.manual_seed(2)
    cfg = UNetConfig(**TINY, use_motion_modules=True, motion_num_heads=2)
    R = cfg.num_res_blocks  # 1 in TINY

    sd = {}
    sd.update(prefixed_state(TorchMotionModule(32, 2),
                             "down_blocks.0.motion_modules.0"))
    sd.update(prefixed_state(TorchMotionModule(64, 2),
                             "down_blocks.1.motion_modules.0"))
    sd.update(prefixed_state(TorchMotionModule(64, 2),
                             "up_blocks.0.motion_modules.1"))
    sd.update(prefixed_state(TorchMotionModule(64, 2),
                             "mid_block.motion_modules.0"))  # must be skipped
    tree = convert_motion_modules(sd, cfg)
    assert sorted(tree.keys()) == [
        "dec_motion_1", "enc_motion_0", "enc_motion_1"]

    # reference-native layout
    sd2 = prefixed_state(
        TorchMotionModule(32, 2),
        "model.diffusion_model.input_blocks_motion_module.1.0")
    tree2 = convert_motion_modules(sd2, cfg)
    assert list(tree2.keys()) == ["enc_motion_1"]

    # merge overlays onto a unet tree without touching other params
    base = {"conv_in": {"kernel": np.zeros((3, 3, 4, 32))},
            "enc_motion_0": {"stale": np.zeros(1)}}
    merged = merge_motion_state(base, tree)
    assert "kernel" in merged["conv_in"]
    assert "proj_in" in merged["enc_motion_0"]
    assert "stale" in merged["enc_motion_0"]  # update, not replace


def test_motion_module_end_to_end_in_unet():
    """Converted motion weights drop into the temporal UNet tree and the
    forward runs (stage-3 init path: image ckpt + AnimateDiff mm)."""
    from magicdance_tpu.convert.torch_convert import (
        convert_motion_modules,
        convert_unet,
        merge_motion_state,
        to_jax,
    )
    from torch_ref import TorchMotionModule, TorchUNet

    torch.manual_seed(3)
    cfg = UNetConfig(**TINY, use_motion_modules=True, motion_num_heads=2)
    tunet = TorchUNet(**{k: v for k, v in TINY.items() if k != "num_heads"},
                      heads=TINY["num_heads"])
    sd = prefixed_state(tunet, "model.diffusion_model")
    unet_tree = convert_unet(sd, "model.diffusion_model", cfg)

    mm_sd = {}
    units = [(0, 0, 32), (1, 0, 64)]  # (level, j, channels) per TINY plan
    for lvl, j, ch in units:
        mm_sd.update(prefixed_state(TorchMotionModule(ch, 2),
                                    f"down_blocks.{lvl}.motion_modules.{j}"))
    for lvl, j, ch in [(0, 0, 64), (0, 1, 64), (1, 0, 32), (1, 1, 32)]:
        mm_sd.update(prefixed_state(TorchMotionModule(ch, 2),
                                    f"up_blocks.{lvl}.motion_modules.{j}"))
    merged = merge_motion_state(unet_tree, convert_motion_modules(mm_sd, cfg))

    unet = UNet(cfg)
    B, F = 2, 2
    x = jnp.zeros((B * F, 8, 8, 4))
    t = jnp.zeros((B * F,), jnp.int32)
    ctx = jnp.zeros((B * F, 5, 16))
    # init to learn the expected tree, then swap in converted params
    ref_params = unet.init(jax.random.PRNGKey(0), x, t, ctx, num_frames=F,
                           dtype=jnp.float32)
    from flax import traverse_util

    want = set(traverse_util.flatten_dict(ref_params["params"]).keys())
    got = set(traverse_util.flatten_dict(to_jax(merged)).keys())
    assert want == got, (sorted(want - got)[:5], sorted(got - want)[:5])
    out, _ = unet.apply({"params": to_jax(merged)}, x, t, ctx, num_frames=F,
                        dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
