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
