"""Shape/semantics tests for the Flax model zoo on tiny configs
(SURVEY.md §4 implication (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdance_tpu.config import (
    CLIPTextConfig,
    ControlNetConfig,
    ModelConfig,
    ModelVariant,
    UNetConfig,
    VAEConfig,
)
from magicdance_tpu.models.clip import CLIPTextEncoder
from magicdance_tpu.models.controlnet import PoseControlNet
from magicdance_tpu.models.magicpose import MagicPoseModel
from magicdance_tpu.models.unet import UNet, num_bank_entries, unet_plan
from magicdance_tpu.models.vae import AutoencoderKL


def tiny_unet_cfg(**kw):
    base = dict(
        model_channels=32,
        channel_mult=(1, 2),
        num_res_blocks=1,
        attention_resolutions=(1, 2),
        num_heads=2,
        context_dim=16,
    )
    base.update(kw)
    return UNetConfig(**base)


def tiny_pose_cfg():
    return ControlNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(1, 2), num_heads=2, context_dim=16,
    )


def test_unet_plan_sd15():
    cfg = UNetConfig()
    units, skip_ch, final_ds = unet_plan(cfg)
    # 12 skip entries incl conv_in (SURVEY §2.1 UNetModel; 13 pose residuals
    # = these 12 + middle)
    assert len(skip_ch) == 12
    assert final_ds == 8
    assert skip_ch == [320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280, 1280, 1280]
    # 16 bank sites: 6 encoder + 1 middle + 9 decoder (SURVEY §3.1)
    assert num_bank_entries(cfg) == 16


def test_unet_forward_and_bank_modes(rng):
    cfg = tiny_unet_cfg()
    model = UNet(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([3, 500])
    ctx = jnp.zeros((2, 5, 16))
    variables = model.init(rng, x, t, ctx)

    out, bank = model.apply(variables, x, t, ctx, collect_bank=True)
    assert out.shape == x.shape
    assert len(bank) == num_bank_entries(cfg)
    # bank entries: (B, S_i, C_i)
    for e in bank:
        assert e.ndim == 3 and e.shape[0] == 2

    out_read, bank_empty = model.apply(variables, x, t, ctx, bank=bank)
    assert out_read.shape == x.shape
    assert bank_empty == ()

    out_plain, _ = model.apply(variables, x, t, ctx)
    assert out_plain.shape == x.shape


def test_unet_bank_broadcast_batch1(rng):
    """One reference (bank batch 1) serving a larger frame batch."""
    cfg = tiny_unet_cfg()
    model = UNet(cfg)
    ref = jnp.zeros((1, 8, 8, 4))
    t1 = jnp.array([7])
    ctx1 = jnp.zeros((1, 5, 16))
    variables = model.init(rng, ref, t1, ctx1)
    _, bank = model.apply(variables, ref, t1, ctx1, collect_bank=True)

    x = jnp.zeros((3, 8, 8, 4))
    out, _ = model.apply(
        variables, x, jnp.array([7, 7, 7]), jnp.zeros((3, 5, 16)), bank=bank
    )
    assert out.shape == x.shape


def test_unet_single_level_forward(rng):
    """A plain forward on a single-level config (channel_mult=(1,)) must not
    trip the deep_level range assert — the split point is only consulted by
    DeepCache passes (regression: the assert used to run unconditionally)."""
    cfg = tiny_unet_cfg(channel_mult=(1,), attention_resolutions=(1,))
    model = UNet(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([3])
    ctx = jnp.zeros((1, 5, 16))
    variables = model.init(rng, x, t, ctx)
    out, _ = model.apply(variables, x, t, ctx)
    assert out.shape == x.shape


def test_unet_zero_init_output():
    """conv_out is zero-init: output is exactly 0 at init (ref zero_module)."""
    cfg = tiny_unet_cfg()
    model = UNet(cfg)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([0])
    ctx = jnp.ones((1, 5, 16))
    variables = model.init(jax.random.PRNGKey(1), x, t, ctx)
    out, _ = model.apply(variables, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_pose_controlnet_residuals(rng):
    cfg = tiny_pose_cfg()
    model = PoseControlNet(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    hint = jnp.zeros((2, 64, 64, 3))
    t = jnp.array([1, 2])
    ctx = jnp.zeros((2, 5, 16))
    variables = model.init(rng, x, hint, t, ctx)
    outs = model.apply(variables, x, hint, t, ctx)
    # skips: conv_in + (1 res)(L0) + down + (1 res)(L1) = 4, + middle = 5
    assert len(outs) == 5
    # zero convs → all residuals exactly zero at init
    for o in outs:
        np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-6)
    assert outs[0].shape == (2, 8, 8, 32)
    assert outs[-1].shape == (2, 4, 4, 64)


def test_unet_consumes_pose_residuals(rng):
    ucfg = tiny_unet_cfg()
    pcfg = tiny_pose_cfg()
    unet = UNet(ucfg)
    pose = PoseControlNet(pcfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([1, 2])
    ctx = jnp.zeros((2, 5, 16))
    uv = unet.init(rng, x, t, ctx)
    pv = pose.init(jax.random.PRNGKey(2), x, jnp.zeros((2, 64, 64, 3)), t, ctx)
    res = pose.apply(pv, x, jnp.zeros((2, 64, 64, 3)), t, ctx)
    out, _ = unet.apply(uv, x, t, ctx, pose_residuals=res)
    assert out.shape == x.shape


def test_vae_roundtrip_shapes(rng):
    cfg = VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1)
    vae = AutoencoderKL(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    variables = vae.init(rng, x, jax.random.PRNGKey(0))
    post = vae.apply(variables, x, method=vae.encode)
    assert post.mean.shape == (1, 16, 16, 4)  # 2 levels → /2
    z = post.mode()
    rec = vae.apply(variables, z, method=vae.decode)
    assert rec.shape == x.shape


def test_vae_posterior_kl_and_sample(rng):
    cfg = VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1)
    vae = AutoencoderKL(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    variables = vae.init(rng, x, jax.random.PRNGKey(0))
    post = vae.apply(variables, x, method=vae.encode)
    s = post.sample(jax.random.PRNGKey(3))
    assert s.shape == post.mean.shape
    assert post.kl().shape == (2,)


def test_clip_text_encoder(rng):
    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4, max_length=10,
        bos_token_id=0, eos_token_id=1,
    )
    model = CLIPTextEncoder(cfg)
    ids = jnp.zeros((2, 10), dtype=jnp.int32)
    variables = model.init(rng, ids)
    out = model.apply(variables, ids)
    assert out.shape == (2, 10, 32)
    assert out.dtype == jnp.float32


def test_clip_causality(rng):
    """Changing a later token must not affect earlier positions."""
    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4, max_length=8,
        bos_token_id=0, eos_token_id=1,
    )
    model = CLIPTextEncoder(cfg)
    ids_a = jnp.array([[5, 6, 7, 8, 1, 1, 1, 1]], dtype=jnp.int32)
    ids_b = ids_a.at[0, 6].set(42)
    variables = model.init(rng, ids_a)
    out_a = model.apply(variables, ids_a)
    out_b = model.apply(variables, ids_b)
    np.testing.assert_allclose(
        np.asarray(out_a[0, :6]), np.asarray(out_b[0, :6]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out_a[0, 7]), np.asarray(out_b[0, 7]))


def tiny_model_cfg(variant=ModelVariant.APPEARANCE_POSE):
    return ModelConfig(
        variant=variant,
        unet=tiny_unet_cfg(),
        pose_control=tiny_pose_cfg(),
        vae=VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1),
        clip=CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                            num_heads=2, max_length=5),
        latent_size=8,
        dtype="float32",
    )


def test_magicpose_apply_model_cond_and_uncond(rng):
    cfg = tiny_model_cfg()
    model = MagicPoseModel(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([10, 20])
    ctx = jnp.zeros((2, 5, 16))
    ref = jnp.zeros((2, 8, 8, 4))
    hint = jnp.zeros((2, 64, 64, 3))
    variables = model.init(rng, x, t, ctx, reference_noisy=ref, pose_hint=hint)
    out = model.apply(variables, x, t, ctx, reference_noisy=ref, pose_hint=hint)
    assert out.shape == x.shape
    out_uc = model.apply(variables, x, t, ctx, uc=True)
    assert out_uc.shape == x.shape


def test_magicpose_precomputed_bank(rng):
    cfg = tiny_model_cfg()
    model = MagicPoseModel(cfg)
    x = jnp.zeros((3, 8, 8, 4))
    t3 = jnp.array([5, 5, 5])
    ctx3 = jnp.zeros((3, 5, 16))
    ref = jnp.zeros((1, 8, 8, 4))
    hint = jnp.zeros((3, 64, 64, 3))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.array([5]),
        jnp.zeros((1, 5, 16)), reference_noisy=ref, pose_hint=hint[:1],
    )
    bank = model.apply(variables, ref, jnp.array([5]), ctx3[:1],
                       method=model.compute_bank)
    out = model.apply(variables, x, t3, ctx3, bank=bank, pose_hint=hint)
    assert out.shape == x.shape


def test_temporal_unet(rng):
    cfg = tiny_unet_cfg(use_motion_modules=True, motion_num_heads=2)
    model = UNet(cfg)
    F = 4
    x = jnp.zeros((F, 8, 8, 4))  # one clip of 4 frames
    t = jnp.full((F,), 3, jnp.int32)
    ctx = jnp.zeros((F, 5, 16))
    variables = model.init(rng, x, t, ctx, num_frames=F)
    out, _ = model.apply(variables, x, t, ctx, num_frames=F)
    assert out.shape == x.shape
    # params must be identical layout for single-frame calls
    out1, _ = model.apply(variables, x[:1], t[:1], ctx[:1], num_frames=1)
    assert out1.shape == (1, 8, 8, 4)


def test_temporal_module_zero_init_is_identity(rng):
    from magicdance_tpu.models.layers import TemporalTransformer

    m = TemporalTransformer(num_heads=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 4, 4, 8))
    variables = m.init(rng, x)
    out = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
