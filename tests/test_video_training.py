"""Temporal (stage-3) training path: clip batches with folded frames,
per-clip reference bank repeat, per-clip timesteps."""

import jax
import jax.numpy as jnp
import numpy as np

from magicdance_tpu.config import (
    CLIPTextConfig,
    ControlNetConfig,
    FreezeRegime,
    ModelConfig,
    ModelVariant,
    OptimConfig,
    TrainConfig,
    UNetConfig,
    VAEConfig,
)
from magicdance_tpu.models import AutoencoderKL, CLIPTextEncoder, MagicPoseModel
from magicdance_tpu.train.trainer import Trainer
from magicdance_tpu.utils.testing import randomize_zero_kernels


def temporal_cfg():
    model = ModelConfig(
        variant=ModelVariant.APPEARANCE_POSE_TEMPORAL,
        unet=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                        attention_resolutions=(1, 2), num_heads=2, context_dim=16,
                        use_motion_modules=True, motion_num_heads=2),
        pose_control=ControlNetConfig(model_channels=32, channel_mult=(1, 2),
                                      num_res_blocks=1, attention_resolutions=(1, 2),
                                      num_heads=2, context_dim=16),
        vae=VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1),
        clip=CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                            num_heads=2, max_length=5),
        latent_size=8,
        dtype="float32",
    )
    return TrainConfig(model=model, freeze=FreezeRegime.MOTION_ONLY,
                       optim=OptimConfig(learning_rate=1e-3, warmup_steps=1),
                       batch_size_per_device=1)


def test_temporal_train_step():
    cfg = temporal_cfg()
    F = 4  # frames per clip (tiny stand-in for 16)
    model = MagicPoseModel(cfg.model)
    vae = AutoencoderKL(cfg.model.vae)
    clip = CLIPTextEncoder(cfg.model.clip)
    rng = jax.random.PRNGKey(0)
    L = 16
    x = jnp.zeros((F, 8, 8, 4))
    mp = model.init(rng, x, jnp.zeros((F,), jnp.int32), jnp.zeros((F, 5, 16)),
                    reference_noisy=x[:1], pose_hint=jnp.zeros((F, 64, 64, 3)),
                    num_frames=F)
    mp = randomize_zero_kernels(mp)
    vp = vae.init(rng, jnp.zeros((1, L, L, 3)), jax.random.PRNGKey(1))
    cp = clip.init(rng, jnp.zeros((1, 5), jnp.int32))

    trainer = Trainer(cfg, model, vae, clip)
    trainer.num_frames = F  # tiny stand-in for the 16-frame default
    state = trainer.create_state(mp, vp, cp)
    # only motion-module params trainable
    assert all(any("motion" in p for p in k)
               for k in state.train_params.keys())

    B_clips = 8  # one clip per virtual device
    batch = {
        "image": jnp.zeros((B_clips * F, L, L, 3)),
        "reference": jnp.zeros((B_clips, L, L, 3)),
        "pose": jnp.zeros((B_clips * F, 64, 64, 3)),
        "input_ids": jnp.zeros((B_clips * F, 5), jnp.int32),
    }
    step = trainer.jitted_step(state, batch)
    s1, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(s1.step) == 1


def test_clip_dataset_batches(tmp_path):
    from PIL import Image

    from magicdance_tpu.data.tiktok_video import TikTokClipDataset

    root = tmp_path
    for split in ("train_set", "pose_map_train_set"):
        vdir = root / split / "vid0"
        vdir.mkdir(parents=True)
        rs = np.random.RandomState(0)
        for i in range(20):
            Image.fromarray(
                rs.randint(0, 255, (32, 24, 3)).astype(np.uint8)
            ).save(vdir / f"{i:04d}.png")

    ds = TikTokClipDataset(root=str(root), image_size=16, clip_len=4,
                           frame_stride=2)
    batch = next(ds.batches(2))
    assert batch["image"].shape == (8, 16, 16, 3)
    assert batch["reference"].shape == (2, 16, 16, 3)
    assert batch["pose"].shape == (8, 16, 16, 3)
