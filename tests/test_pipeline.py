"""End-to-end MagicPosePipeline tests on a tiny config (the library's
user-facing surface), plus CheckpointManager behavior."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdance_tpu.config import (
    CLIPTextConfig,
    ControlNetConfig,
    ModelConfig,
    ModelVariant,
    SampleConfig,
    UNetConfig,
    VAEConfig,
)
from magicdance_tpu.pipeline import MagicPosePipeline


def tiny_model_cfg():
    return ModelConfig(
        variant=ModelVariant.APPEARANCE_POSE,
        unet=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                        attention_resolutions=(1, 2), num_heads=2, context_dim=16),
        pose_control=ControlNetConfig(model_channels=32, channel_mult=(1, 2),
                                      num_res_blocks=1, attention_resolutions=(1, 2),
                                      num_heads=2, context_dim=16),
        # 4 VAE levels => /8, image 32 -> latent 4 (matches hint stride 8)
        vae=VAEConfig(base_channels=32, channel_mult=(1, 1, 1, 1),
                      num_res_blocks=1),
        clip=CLIPTextConfig(vocab_size=49408, hidden_size=16, num_layers=1,
                            num_heads=2, max_length=77),
        latent_size=4,
        dtype="float32",
    )


@pytest.fixture(scope="module")
def pipe():
    p = MagicPosePipeline(tiny_model_cfg())
    p.init_params(jax.random.PRNGKey(0), image_size=32)
    return p


def test_pipeline_sample_frames(pipe):
    pose = jnp.asarray(np.random.RandomState(0).rand(3, 32, 32, 3),
                       jnp.float32)
    ref = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3) * 2 - 1,
                      jnp.float32)
    out = pipe.sample_frames(jax.random.PRNGKey(2), pose, ref,
                             SampleConfig(steps=2, cfg_scale=7.0))
    assert out.shape == (3, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_fast_init_matches_shapes(pipe):
    p2 = MagicPosePipeline(tiny_model_cfg())
    p2.fast_init_params(jax.random.PRNGKey(0), image_size=32)
    a = jax.tree_util.tree_structure(pipe.params)
    b = jax.tree_util.tree_structure(p2.params)
    assert a == b
    for x, y in zip(jax.tree.leaves(pipe.params), jax.tree.leaves(p2.params)):
        assert x.shape == y.shape


def test_pipeline_encoders(pipe):
    emb = pipe.encode_empty(2)
    assert emb.shape == (2, 77, 16)
    ref = jnp.zeros((1, 32, 32, 3))
    lat = pipe.encode_reference(ref)
    assert lat.shape == (1, 4, 4, 4)
    dec = pipe.decode_latents(lat)
    assert dec.shape == (1, 32, 32, 3)


def test_checkpoint_manager_rotation(tmp_path):
    from magicdance_tpu.train.checkpoint import CheckpointManager

    cm = CheckpointManager(str(tmp_path), save_total_limit=2)
    state = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    for s in (1, 2, 3):
        cm.save(s, jax.tree.map(lambda x: x * s, state))
    assert cm.all_steps() == [2, 3]
    restored = cm.restore(target=state)
    np.testing.assert_allclose(np.asarray(restored["a"]),
                               np.arange(4.0) * 3)
    restored2 = cm.restore(step=2, target=state)
    np.testing.assert_allclose(np.asarray(restored2["b"]["c"]),
                               np.ones((2, 2)) * 2)
    with pytest.raises(FileNotFoundError):
        CheckpointManager(str(tmp_path / "empty")).restore(target=state)
