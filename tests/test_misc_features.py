"""Tests: long-prompt CLIP windowing, text filters, FVD helpers, profiling,
inpaint concat conditioning, conv_in expansion surgery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicdance_tpu.config import CLIPTextConfig


def test_encode_long_prompt_windows():
    from magicdance_tpu.models.clip import CLIPTextEncoder, encode_long_prompt

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                         num_heads=2, max_length=7, bos_token_id=0,
                         eos_token_id=1)
    enc = CLIPTextEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 7), jnp.int32))
    ids = jnp.asarray(np.arange(2, 14, dtype=np.int32)[None])  # 12 raw tokens
    out = encode_long_prompt(enc, params, ids, windows=3)
    assert out.shape == (1, 3 * 7, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_text_filter():
    from magicdance_tpu.data.text_filters import TextFilter

    f = TextFilter()
    assert f("")
    assert f("a person dancing in a studio")
    assert not f("explicit content")
    assert not f("1234 5678 90 12 345")  # numeric-dominated
    assert not f("これは日本語のキャプションです")  # non-ascii
    g = TextFilter(extra_blocklist=["dancing"])
    assert not g("a person dancing")


def test_fvd_clip_resample():
    from magicdance_tpu.metrics.fvd import _resample_clip

    v = np.arange(10)[:, None, None, None] * np.ones((1, 2, 2, 3))
    out = _resample_clip(v, 4)
    assert out.shape == (4, 2, 2, 3)
    np.testing.assert_array_equal(out[:, 0, 0, 0], [0, 3, 6, 9])
    # shorter than target: repeats
    out2 = _resample_clip(v[:2], 4)
    assert out2.shape == (4, 2, 2, 3)


def test_profiling_utils():
    from magicdance_tpu.utils.profiling import StepTimer, device_memory_stats

    t = StepTimer()
    assert t.steps_per_sec is None
    t.tick(); t.tick()
    assert t.steps_per_sec is not None and t.steps_per_sec > 0
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_concat_cond_inpaint_variant():
    from magicdance_tpu.config import (ControlNetConfig, ModelConfig,
                                       ModelVariant, UNetConfig, VAEConfig)
    from magicdance_tpu.models import MagicPoseModel

    cfg = ModelConfig(
        variant=ModelVariant.APPEARANCE_POSE,
        unet=UNetConfig(in_channels=9, model_channels=32, channel_mult=(1, 2),
                        num_res_blocks=1, attention_resolutions=(1, 2),
                        num_heads=2, context_dim=16),
        pose_control=ControlNetConfig(model_channels=32, channel_mult=(1, 2),
                                      num_res_blocks=1,
                                      attention_resolutions=(1, 2),
                                      num_heads=2, context_dim=16),
        vae=VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1),
        clip=CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                            num_heads=2, max_length=5),
        dtype="float32",
    )
    model = MagicPoseModel(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    cc = jnp.zeros((1, 8, 8, 5))  # mask + masked latent
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 5, 16))
    # NOTE: the appearance branch consumes 4-ch reference latents; the main
    # UNet takes 9 channels. Init via uncond (9ch) + bank path separately.
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, uc=True,
                        concat_cond=cc)
    out = model.apply(params, x, t, ctx, uc=True, concat_cond=cc)
    assert out.shape == (1, 8, 8, 4)


def test_expand_conv_in_surgery():
    from magicdance_tpu.convert.torch_convert import expand_conv_in

    tree = {"conv_in": {"kernel": np.ones((3, 3, 4, 8), np.float32),
                        "bias": np.zeros(8, np.float32)}}
    out = expand_conv_in(tree, 9)
    assert out["conv_in"]["kernel"].shape == (3, 3, 9, 8)
    np.testing.assert_array_equal(out["conv_in"]["kernel"][:, :, 4:], 0)
    np.testing.assert_array_equal(out["conv_in"]["kernel"][:, :, :4], 1)
    with pytest.raises(ValueError):
        expand_conv_in(tree, 2)
