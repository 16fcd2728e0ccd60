"""Multi-device (8 virtual CPU) training tests — the distributed coverage the
reference never had (SURVEY.md §4: torchrun-only, no fixtures)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from magicdance_tpu.train.trainer import (
    Trainer,
    merge_params,
    partition_params,
    trainable_predicate,
)


def tiny_train_cfg(**kw):
    model = ModelConfig(
        variant=ModelVariant.APPEARANCE_POSE,
        unet=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                        attention_resolutions=(1, 2), num_heads=2, context_dim=16),
        pose_control=ControlNetConfig(model_channels=32, channel_mult=(1, 2),
                                      num_res_blocks=1, attention_resolutions=(1, 2),
                                      num_heads=2, context_dim=16),
        vae=VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1),
        clip=CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                            num_heads=2, max_length=5),
        latent_size=8,
        dtype="float32",
    )
    base = dict(model=model, optim=OptimConfig(learning_rate=1e-3, warmup_steps=2),
                batch_size_per_device=1)
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def _built_once():
    """One shared init for the whole module: `build` only depends on
    cfg.model, which is identical across the module's TrainConfigs."""
    return build(tiny_train_cfg())


@pytest.fixture()
def built(_built_once):
    """Per-test COPIES of the shared trees: create_state's train leaves
    alias the caller's buffers and the jitted step donates them, so a test
    that steps would invalidate the module-shared tree otherwise. The copy
    is milliseconds; the init it replaces is the expensive part."""
    model, vae, clip, mp, vp, cp = _built_once
    mp, vp, cp = jax.tree.map(jnp.copy, (mp, vp, cp))
    return model, vae, clip, mp, vp, cp


def build(cfg):
    model = MagicPoseModel(cfg.model)
    vae = AutoencoderKL(cfg.model.vae)
    clip = CLIPTextEncoder(cfg.model.clip)
    rng = jax.random.PRNGKey(0)
    B, L = 8, 16  # image size 16 -> latent 8 with 2 VAE levels
    x = jnp.zeros((B, L // 2, L // 2, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 5, 16))
    mp = model.init(rng, x, t, ctx,
                    reference_noisy=x[:1], pose_hint=jnp.zeros((B, 8 * L // 2, 8 * L // 2, 3)))
    # zero-init output layers block gradient flow at random init; real runs
    # load pretrained weights (see utils.testing)
    from magicdance_tpu.utils.testing import randomize_zero_kernels

    mp = randomize_zero_kernels(mp)
    vp = vae.init(rng, jnp.zeros((1, L, L, 3)), jax.random.PRNGKey(1))
    cp = clip.init(rng, jnp.zeros((1, 5), jnp.int32))
    return model, vae, clip, mp, vp, cp


def make_batch(B=8, L=16):
    k = jax.random.PRNGKey(7)
    return {
        "image": jax.random.uniform(k, (B, L, L, 3)) * 2 - 1,
        "reference": jax.random.uniform(k, (B, L, L, 3)) * 2 - 1,
        "pose": jax.random.uniform(k, (B, 8 * L // 2, 8 * L // 2, 3)),  # hint = 8x latent res
        "input_ids": jnp.zeros((B, 5), jnp.int32),
    }


def test_trainable_predicate_regimes():
    pred = trainable_predicate(FreezeRegime.FINETUNE_CONTROL)
    assert pred(("appearance_unet", "enc_res_0", "conv_in", "kernel"))
    assert pred(("pose_control", "hint_encoder", "conv_0", "kernel"))
    assert not pred(("unet", "enc_res_0", "conv_in", "kernel"))

    pred = trainable_predicate(FreezeRegime.APPEARANCE_PRETRAIN)
    assert pred(("unet", "enc_attn_0", "block_0", "attn1", "to_q", "kernel"))
    assert not pred(("unet", "enc_attn_0", "block_0", "attn2", "to_q", "kernel"))
    assert pred(("appearance_unet", "mid_attn", "block_0", "ff", "proj_in", "kernel"))

    pred = trainable_predicate(FreezeRegime.MOTION_ONLY)
    assert pred(("unet", "enc_motion_0", "attn_0", "to_q", "kernel"))
    assert not pred(("unet", "enc_attn_0", "block_0", "attn1", "to_q", "kernel"))

    # sd_locked=False unlocks the UNet decoder
    pred = trainable_predicate(FreezeRegime.FINETUNE_CONTROL, sd_locked=False)
    assert pred(("unet", "dec_res_0", "conv_in", "kernel"))
    assert pred(("unet", "conv_out", "kernel"))
    assert not pred(("unet", "enc_res_0", "conv_in", "kernel"))


def test_partition_roundtrip(built):
    cfg = tiny_train_cfg()
    model, vae, clip, mp, vp, cp = built
    pred = trainable_predicate(cfg.freeze, cfg.sd_locked)
    train, frozen = partition_params(mp["params"], pred)
    assert train and frozen
    merged = merge_params(train, frozen)
    flat_a = jax.tree_util.tree_leaves(mp["params"])
    flat_b = jax.tree_util.tree_leaves(merged)
    assert len(flat_a) == len(flat_b)
    # frozen set contains the whole main unet
    assert all(k[0] != "unet" for k in train)


def test_train_step_runs_and_freezes(rng, built):
    cfg = tiny_train_cfg()
    model, vae, clip, mp, vp, cp = built
    trainer = Trainer(cfg, model, vae, clip)
    state = trainer.create_state(mp, vp, cp)
    batch = make_batch()
    # the state is donated to the jitted step; snapshot before stepping
    frozen_before = [np.asarray(x) for x in jax.tree.leaves(state.frozen_params["model"])]
    train_before = [np.asarray(x) for x in jax.tree.leaves(state.train_params)]
    step = trainer.jitted_step(state, batch)
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    state2, metrics2 = step(state1, batch, jax.random.PRNGKey(2))
    assert int(state2.step) == 2
    # frozen params identical; at least some trainable params moved
    for a, b in zip(frozen_before, jax.tree.leaves(state2.frozen_params["model"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(train_before, jax.tree.leaves(state2.train_params))
    )
    assert moved


def test_zero1_opt_state_is_sharded(built):
    cfg = tiny_train_cfg()
    model, vae, clip, mp, vp, cp = built
    trainer = Trainer(cfg, model, vae, clip)
    state = trainer.create_state(mp, vp, cp)
    sh = trainer.state_shardings(state)
    from jax.sharding import PartitionSpec as P

    specs = [s.spec for s in jax.tree.leaves(sh.opt_state)
             if hasattr(s, "spec")]
    assert any(spec != P() for spec in specs), "no opt-state leaf got sharded"
    # params stay replicated (ZeRO-1, not ZeRO-3)
    assert all(s.spec == P() for s in jax.tree.leaves(sh.train_params))


def test_grad_accum_steps(built):
    cfg = tiny_train_cfg(optim=OptimConfig(learning_rate=1e-3, warmup_steps=1,
                                           grad_accum=2))
    model, vae, clip, mp, vp, cp = built
    trainer = Trainer(cfg, model, vae, clip)
    state = trainer.create_state(mp, vp, cp)
    batch = make_batch()
    train_before = [np.asarray(x) for x in jax.tree.leaves(state.train_params)]
    step = trainer.jitted_step(state, batch)
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    # after 1 micro-step params must be unchanged (accumulating)
    for a, b in zip(train_before, jax.tree.leaves(s1.train_params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # first real update lands on warmup step 0 (lr=0); run through the
    # second accumulation window to see movement
    s = s1
    for i in range(2, 5):
        s, _ = step(s, batch, jax.random.PRNGKey(i))
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(train_before, jax.tree.leaves(s.train_params))
    )
    assert moved


def test_int8_frozen_storage(built):
    """frozen_dtype='int8': train step runs with the quantized frozen tree
    and its loss stays close to the bf16-frozen step (weight-only storage
    quantization; train/quant.py)."""
    model, vae, clip, mp, vp, cp = built
    losses = {}
    for fd in ("bfloat16", "int8"):
        from magicdance_tpu.config import OptimConfig

        cfg = tiny_train_cfg(optim=OptimConfig(learning_rate=1e-3,
                                               warmup_steps=2,
                                               frozen_dtype=fd))
        tr = Trainer(cfg, model, vae, clip)
        state = tr.create_state(jax.tree.map(jnp.copy, mp),
                                jax.tree.map(jnp.copy, vp),
                                jax.tree.map(jnp.copy, cp))
        if fd == "int8":
            from magicdance_tpu.train.quant import QuantizedLeaf, has_quantized

            assert has_quantized(state.frozen_params)
            # at least one big leaf is int8 on device
            qleaves = [x for x in jax.tree.leaves(
                state.frozen_params,
                is_leaf=lambda l: isinstance(l, QuantizedLeaf))
                if isinstance(x, QuantizedLeaf)]
            assert qleaves and qleaves[0].q.dtype == jnp.int8
        B = 4
        batch = {"image": jnp.ones((B, 16, 16, 3)) * 0.1,
                 "reference": jnp.ones((B, 16, 16, 3)) * 0.2,
                 "pose": jnp.zeros((B, 64, 64, 3)),
                 "input_ids": jnp.zeros((B, 5), jnp.int32)}
        new_state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(7))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        losses[fd] = loss
    # per-channel int8 weight quantization perturbs the loss only mildly
    assert abs(losses["int8"] - losses["bfloat16"]) < 0.15 * (
        abs(losses["bfloat16"]) + 1e-3)
