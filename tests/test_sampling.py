"""Sampler tests: DDIM scan + video overlap sampling on tiny configs."""

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
from magicdance_tpu.models import MagicPoseModel
from magicdance_tpu.ops.schedules import make_ddim_schedule, make_schedule
from magicdance_tpu.sampling.ddim import ddim_sample
from magicdance_tpu.sampling.overlap import ddim_sample_video, window_starts
from magicdance_tpu.utils.testing import randomize_zero_kernels


def tiny_cfg(variant=ModelVariant.APPEARANCE_POSE, motion=False):
    return ModelConfig(
        variant=variant,
        unet=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                        attention_resolutions=(1, 2), num_heads=2, context_dim=16,
                        use_motion_modules=motion, motion_num_heads=2),
        pose_control=ControlNetConfig(model_channels=32, channel_mult=(1, 2),
                                      num_res_blocks=1, attention_resolutions=(1, 2),
                                      num_heads=2, context_dim=16),
        vae=VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1),
        clip=CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                            num_heads=2, max_length=5),
        latent_size=8,
        dtype="float32",
    )


def init_model(cfg, B=1):
    model = MagicPoseModel(cfg)
    x = jnp.zeros((B, 8, 8, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 5, 16))
    kw = {}
    if cfg.has_appearance:
        kw["reference_noisy"] = x[:1]
    if cfg.has_pose:
        kw["pose_hint"] = jnp.zeros((B, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, **kw)
    return model, randomize_zero_kernels(params)


def test_ddim_sample_shapes_and_determinism():
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 4)
    scfg = SampleConfig(steps=4, cfg_scale=7.0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jnp.zeros((1, 5, 16))
    ref = jnp.zeros((1, 8, 8, 4))
    hint = jnp.zeros((2, 64, 64, 3))
    out1 = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(2),
                       x_T, ctx, ctx, reference_latent=ref, pose_hint=hint)
    out2 = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(2),
                       x_T, ctx, ctx, reference_latent=ref, pose_hint=hint)
    assert out1.shape == (2, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_ddim_without_cfg_and_controls():
    cfg = tiny_cfg(variant=ModelVariant.SD)
    model, params = init_model(cfg)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 3)
    scfg = SampleConfig(steps=3, cfg_scale=1.0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    out = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(2),
                      x_T, jnp.zeros((1, 5, 16)))
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_window_starts():
    np.testing.assert_array_equal(window_starts(16, 16, 12), [0])
    s = window_starts(40, 16, 12)
    # covers every frame
    covered = np.zeros(40, bool)
    for st in s:
        covered[(st + np.arange(16)) % 40] = True
    assert covered.all()


def test_overlap_video_sampling():
    cfg = tiny_cfg(motion=True)
    F, W = 10, 4
    model, params = init_model(cfg, B=W)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 2)
    scfg = SampleConfig(steps=2, cfg_scale=7.0, window=W, stride=3)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (F, 8, 8, 4))
    ctx = jnp.zeros((1, 5, 16))
    ref = jnp.zeros((1, 8, 8, 4))
    hint = jnp.zeros((F, 64, 64, 3))
    out = ddim_sample_video(model, params, sched, ddim, scfg,
                            jax.random.PRNGKey(2), x_T, ctx, ctx,
                            reference_latent=ref, pose_hint=hint)
    assert out.shape == (F, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_overlap_video_turbo():
    """Video-sampler turbo: cfg_interval/uncond_every (frame-space uncond
    cache, robust to window rotation) and bank_every. cfg_interval=(0,1) +
    uncond_every=1 + bank_every=1 runs the turbo scan but must equal the
    exact path; strided variants run, are deterministic, and differ."""
    cfg = tiny_cfg(motion=True)
    F, W = 10, 4
    model, params = init_model(cfg, B=W)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 3)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (F, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    uctx = jnp.zeros_like(ctx)
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (F, 64, 64, 3))
    kw = dict(reference_latent=ref, pose_hint=hint)

    exact = ddim_sample_video(model, params, sched, ddim,
                              SampleConfig(steps=3, cfg_scale=7.0,
                                           window=W, stride=3),
                              jax.random.PRNGKey(5), x_T, ctx, uctx, **kw)
    t1 = ddim_sample_video(model, params, sched, ddim,
                           SampleConfig(steps=3, cfg_scale=7.0, window=W,
                                        stride=3, cfg_interval=(0.0, 1.0)),
                           jax.random.PRNGKey(5), x_T, ctx, uctx, **kw)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(exact),
                               atol=1e-5, rtol=1e-5)
    for scfg in (
        SampleConfig(steps=3, cfg_scale=7.0, window=W, stride=3,
                     uncond_every=2),
        SampleConfig(steps=3, cfg_scale=7.0, window=W, stride=3,
                     bank_every=2),
        SampleConfig(steps=3, cfg_scale=7.0, window=W, stride=3,
                     uncond_every=2, bank_every=2,
                     cfg_interval=(0.1, 0.95)),
    ):
        o1 = ddim_sample_video(model, params, sched, ddim, scfg,
                               jax.random.PRNGKey(5), x_T, ctx, uctx, **kw)
        o2 = ddim_sample_video(model, params, sched, ddim, scfg,
                               jax.random.PRNGKey(5), x_T, ctx, uctx, **kw)
        assert np.isfinite(np.asarray(o1)).all()
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        assert not np.allclose(np.asarray(o1), np.asarray(exact), atol=1e-4)


def test_plms_sampler():
    from magicdance_tpu.sampling.plms import plms_sample

    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 6)
    scfg = SampleConfig(steps=6, cfg_scale=3.0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    out = plms_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(2),
                      x_T, jnp.zeros((1, 5, 16)), jnp.zeros((1, 5, 16)),
                      reference_latent=jnp.zeros((1, 8, 8, 4)),
                      pose_hint=jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_dpmpp_sampler():
    from magicdance_tpu.sampling.dpm import dpmpp_2m_sample

    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    scfg = SampleConfig(steps=8, cfg_scale=3.0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    out = dpmpp_2m_sample(model, params, sched, 8, scfg, jax.random.PRNGKey(2),
                          x_T, jnp.zeros((1, 5, 16)), jnp.zeros((1, 5, 16)),
                          reference_latent=jnp.zeros((1, 8, 8, 4)),
                          pose_hint=jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_cfg_matches_separate_passes():
    """cfg_fused_eps must be numerically identical to the two-pass scheme."""
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([500, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    uctx = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))

    bank = model.apply(params, ref, t[:1], ctx, method=model.compute_bank)
    ctx2 = jnp.broadcast_to(ctx, (2, 5, 16))
    uctx2 = jnp.broadcast_to(uctx, (2, 5, 16))
    eps_c_ref = model.apply(params, x, t, ctx2, bank=bank, pose_hint=hint)
    eps_u_ref = model.apply(params, x, t, uctx2, uc=True)

    eps_c, eps_u = model.apply(params, x, t, ctx2, uctx2, bank=bank,
                               pose_hint=hint, method=model.cfg_fused_eps)
    np.testing.assert_allclose(np.asarray(eps_c), np.asarray(eps_c_ref),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(eps_u), np.asarray(eps_u_ref),
                               atol=3e-5, rtol=3e-5)


def test_balance_control_mode():
    """'balance' CFG: uncond keeps the control branches (ref ddim.py:540-567);
    with identical cond/uncond text the guidance term cancels exactly."""
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=1)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 2)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))

    bal = SampleConfig(steps=2, cfg_scale=7.0, control_mode="balance")
    out_bal = ddim_sample(model, params, sched, ddim, bal,
                          jax.random.PRNGKey(5), x_T, ctx, ctx,
                          reference_latent=ref, pose_hint=hint)
    nocfg = SampleConfig(steps=2, cfg_scale=1.0)
    out_plain = ddim_sample(model, params, sched, ddim, nocfg,
                            jax.random.PRNGKey(5), x_T, ctx, ctx,
                            reference_latent=ref, pose_hint=hint)
    # same text on both passes => balance-CFG collapses to the cond pass
    np.testing.assert_allclose(np.asarray(out_bal), np.asarray(out_plain),
                               atol=1e-4, rtol=1e-4)
    # while controlnet_important differs (uncond drops the controls)
    imp = SampleConfig(steps=2, cfg_scale=7.0)
    out_imp = ddim_sample(model, params, sched, ddim, imp,
                          jax.random.PRNGKey(5), x_T, ctx, ctx,
                          reference_latent=ref, pose_hint=hint)
    assert not np.allclose(np.asarray(out_imp), np.asarray(out_bal), atol=1e-3)


def test_turbo_full_interval_is_exact():
    """cfg_interval=(0,1) + uncond_every=1 takes the turbo scan but computes
    the exact same trajectory as the default path (every step active+fresh,
    identical per-step RNG splits)."""
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 3)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jnp.zeros((1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    exact = ddim_sample(model, params, sched, ddim,
                        SampleConfig(steps=3, cfg_scale=7.0),
                        jax.random.PRNGKey(5), x_T, ctx, ctx,
                        reference_latent=ref, pose_hint=hint)
    turbo = ddim_sample(model, params, sched, ddim,
                        SampleConfig(steps=3, cfg_scale=7.0,
                                     cfg_interval=(0.0, 1.0)),
                        jax.random.PRNGKey(5), x_T, ctx, ctx,
                        reference_latent=ref, pose_hint=hint)
    np.testing.assert_allclose(np.asarray(turbo), np.asarray(exact),
                               atol=1e-5, rtol=1e-5)


def test_turbo_uncond_reuse_and_interval():
    """uncond_every>1 / a restricted cfg_interval run, stay finite and
    deterministic, and actually change the trajectory vs exact CFG."""
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    exact = ddim_sample(model, params, sched, ddim,
                        SampleConfig(steps=4, cfg_scale=7.0),
                        jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                        reference_latent=ref, pose_hint=hint)
    for scfg in (
        SampleConfig(steps=4, cfg_scale=7.0, uncond_every=2),
        SampleConfig(steps=4, cfg_scale=7.0, cfg_interval=(0.3, 0.9)),
        SampleConfig(steps=4, cfg_scale=7.0, cfg_interval=(0.3, 0.9),
                     uncond_every=2),
    ):
        out1 = ddim_sample(model, params, sched, ddim, scfg,
                           jax.random.PRNGKey(5), x_T, ctx,
                           jnp.zeros_like(ctx),
                           reference_latent=ref, pose_hint=hint)
        out2 = ddim_sample(model, params, sched, ddim, scfg,
                           jax.random.PRNGKey(5), x_T, ctx,
                           jnp.zeros_like(ctx),
                           reference_latent=ref, pose_hint=hint)
        assert np.isfinite(np.asarray(out1)).all()
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert not np.allclose(np.asarray(out1), np.asarray(exact), atol=1e-4)


def test_turbo_pose_reuse():
    """pose_every>1: residuals refresh on a stride; pose_every=1 inside the
    turbo scan (forced via cfg_interval) must stay exact."""
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    exact = ddim_sample(model, params, sched, ddim,
                        SampleConfig(steps=4, cfg_scale=7.0),
                        jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                        reference_latent=ref, pose_hint=hint)
    # turbo scan with every pose step refreshed == exact
    t1 = ddim_sample(model, params, sched, ddim,
                     SampleConfig(steps=4, cfg_scale=7.0,
                                  cfg_interval=(0.0, 1.0), pose_every=1),
                     jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                     reference_latent=ref, pose_hint=hint)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(exact),
                               atol=1e-5, rtol=1e-5)
    # stride-2 reuse: finite, deterministic, different from exact
    scfg = SampleConfig(steps=4, cfg_scale=7.0, pose_every=2)
    o1 = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(5),
                     x_T, ctx, jnp.zeros_like(ctx),
                     reference_latent=ref, pose_hint=hint)
    o2 = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(5),
                     x_T, ctx, jnp.zeros_like(ctx),
                     reference_latent=ref, pose_hint=hint)
    assert np.isfinite(np.asarray(o1)).all()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(exact), atol=1e-4)
    # pose reuse without CFG (cfg_scale=1) exercises the no-uncond turbo leg
    o3 = ddim_sample(model, params, sched, ddim,
                     SampleConfig(steps=4, cfg_scale=1.0, pose_every=2),
                     jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                     reference_latent=ref, pose_hint=hint)
    assert np.isfinite(np.asarray(o3)).all()


def test_turbo_bank_reuse():
    """bank_every>1: the appearance bank refreshes on a stride and is
    reused in between; bank_every=1 inside the turbo scan must stay exact;
    combined with every other turbo flag stays finite."""
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    exact = ddim_sample(model, params, sched, ddim,
                        SampleConfig(steps=4, cfg_scale=7.0),
                        jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                        reference_latent=ref, pose_hint=hint)
    # turbo scan with every bank step refreshed == exact
    t1 = ddim_sample(model, params, sched, ddim,
                     SampleConfig(steps=4, cfg_scale=7.0,
                                  cfg_interval=(0.0, 1.0), bank_every=1),
                     jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                     reference_latent=ref, pose_hint=hint)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(exact),
                               atol=1e-5, rtol=1e-5)
    # wonoise=True makes the bank t-only dependent; with a 4-step schedule
    # stride 2 reuses each bank once
    scfg = SampleConfig(steps=4, cfg_scale=7.0, bank_every=2)
    o1 = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(5),
                     x_T, ctx, jnp.zeros_like(ctx),
                     reference_latent=ref, pose_hint=hint)
    o2 = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(5),
                     x_T, ctx, jnp.zeros_like(ctx),
                     reference_latent=ref, pose_hint=hint)
    assert np.isfinite(np.asarray(o1)).all()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(exact), atol=1e-4)
    # wonoise=False exercises the per-step renoising inside the gated branch
    o3 = ddim_sample(model, params, sched, ddim,
                     SampleConfig(steps=4, cfg_scale=7.0, bank_every=2,
                                  wonoise=False),
                     jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                     reference_latent=ref, pose_hint=hint)
    assert np.isfinite(np.asarray(o3)).all()
    # stacked with every other turbo flag
    o4 = ddim_sample(model, params, sched, ddim,
                     SampleConfig(steps=4, cfg_scale=7.0, bank_every=2,
                                  pose_every=2, uncond_every=2,
                                  deepcache_every=2,
                                  cfg_interval=(0.1, 0.95)),
                     jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                     reference_latent=ref, pose_hint=hint)
    assert np.isfinite(np.asarray(o4)).all()


def test_deepcache():
    """DeepCache: shallow pass fed the deep feature of the SAME (x,t)
    reproduces the full forward exactly; the sampler's deepcache_every
    stride runs, is deterministic, and diverges from exact."""
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([500, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    bank = model.apply(params, ref, t[:1], ctx[:1], method=model.compute_bank)
    full = model.apply(params, x, t, ctx, bank=bank, pose_hint=hint)
    out_cd, deep = model.apply(params, x, t, ctx, bank=bank, pose_hint=hint,
                               collect_deep=True)
    np.testing.assert_allclose(np.asarray(out_cd), np.asarray(full), atol=1e-6)
    shallow = model.apply(params, x, t, ctx, bank=bank, pose_hint=hint,
                          deep_cache_in=deep)
    np.testing.assert_allclose(np.asarray(shallow), np.asarray(full),
                               atol=3e-5, rtol=3e-5)

    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4))
    exact = ddim_sample(model, params, sched, ddim,
                        SampleConfig(steps=4, cfg_scale=7.0),
                        jax.random.PRNGKey(6), x_T, ctx[:1],
                        jnp.zeros((1, 5, 16)),
                        reference_latent=ref, pose_hint=hint)
    scfg = SampleConfig(steps=4, cfg_scale=7.0, deepcache_every=2)
    o1 = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(6),
                     x_T, ctx[:1], jnp.zeros((1, 5, 16)),
                     reference_latent=ref, pose_hint=hint)
    o2 = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(6),
                     x_T, ctx[:1], jnp.zeros((1, 5, 16)),
                     reference_latent=ref, pose_hint=hint)
    assert np.isfinite(np.asarray(o1)).all()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(exact), atol=1e-4)
    # combined with every other turbo flag
    o3 = ddim_sample(model, params, sched, ddim,
                     SampleConfig(steps=4, cfg_scale=7.0, deepcache_every=2,
                                  pose_every=2, uncond_every=2,
                                  cfg_interval=(0.1, 0.95)),
                     jax.random.PRNGKey(6), x_T, ctx[:1],
                     jnp.zeros((1, 5, 16)),
                     reference_latent=ref, pose_hint=hint)
    assert np.isfinite(np.asarray(o3)).all()


def test_turbo_schedule_uncond_deepcache_alignment():
    """Regression (round-1 advisor, high): the uncond DeepCache refresh
    schedule was `refresh & deep_refresh`, intersecting schedules indexed
    over CFG-active steps vs ALL steps. With an odd inactive prefix (e.g.
    cfg_interval excluding the earliest executed steps) and
    uncond_every=2/deepcache_every=2 the strides never align, so EVERY
    fresh-uncond step ran shallow against the all-zeros cache init. The
    fixed schedule fires over refresh-step ordinals and must always make
    the first fresh-uncond step a full pass."""
    from magicdance_tpu.sampling.ddim import build_turbo_schedules

    S, T = 8, 1000
    timesteps = np.arange(1, T, T // S)[:S]  # [1, 126, ..., 876]

    # the pathological case: frac(876)=0.876 > hi=0.85 -> inactive prefix 1
    scfg = SampleConfig(steps=S, cfg_scale=7.0, cfg_interval=(0.0, 0.85),
                        uncond_every=2, deepcache_every=2)
    active, refresh, _, deep, udeep, _ = build_turbo_schedules(
        scfg, T, timesteps, use_cfg=True)
    assert not active[S - 1]          # first executed step is CFG-inactive
    assert not (refresh & deep).any()  # old formula => empty schedule (bug)
    assert udeep.any()
    # first refresh step in execution order must be a full uncond pass
    exec_order = [S - 1 - i for i in range(S)]
    first_refresh = next(s for s in exec_order if refresh[s])
    assert udeep[first_refresh]

    # invariants across a config sweep
    for lo, hi in ((0.0, 1.0), (0.15, 0.85), (0.0, 0.6), (0.3, 0.95)):
        for ue in (1, 2, 3):
            for de in (1, 2, 3, 5):
                scfg = SampleConfig(steps=S, cfg_scale=7.0,
                                    cfg_interval=(lo, hi),
                                    uncond_every=ue, deepcache_every=de)
                _, refresh, _, _, udeep, _ = build_turbo_schedules(
                    scfg, T, timesteps, use_cfg=True)
                # udeep fires only on refresh steps
                assert not (udeep & ~refresh).any()
                refresh_steps = [s for s in exec_order if refresh[s]]
                if refresh_steps:
                    assert udeep[refresh_steps[0]]
                    # cadence: every ceil(de/ue)-th refresh step
                    stride = -(-de // ue)
                    fired = [i for i, s in enumerate(refresh_steps)
                             if udeep[s]]
                    assert fired == list(range(0, len(refresh_steps), stride))


def test_turbo_uncond_deepcache_matches_python_oracle():
    """The full turbo scan (deepcache + uncond deepcache + cfg_interval with
    an inactive prefix + uncond_every) must match a step-by-step Python
    implementation of the intended semantics."""
    from magicdance_tpu.sampling.ddim import build_turbo_schedules, ddim_step

    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    S = 6
    ddim = make_ddim_schedule(sched, S)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    uctx = jnp.zeros_like(ctx)
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))

    frac = np.asarray(ddim.timesteps, np.float64) / sched.num_timesteps
    # choose hi so the first executed (largest-t) step is inactive
    hi = float((frac[-1] + frac[-2]) / 2)
    scfg = SampleConfig(steps=S, cfg_scale=7.0, cfg_interval=(0.0, hi),
                        uncond_every=2, deepcache_every=2)
    out = ddim_sample(model, params, sched, ddim, scfg, jax.random.PRNGKey(5),
                      x_T, ctx, uctx, reference_latent=ref, pose_hint=hint)

    active, refresh, _, deep_refresh, udeep, _ = build_turbo_schedules(
        scfg, sched.num_timesteps, np.asarray(ddim.timesteps), use_cfg=True)
    B = 2
    ctx_b = jnp.broadcast_to(ctx, (B,) + ctx.shape[1:])
    uctx_b = jnp.broadcast_to(uctx, (B,) + uctx.shape[1:])
    x = x_T
    eps_u = jnp.zeros_like(x_T)
    deep = deep_u = None
    for i in range(S):
        step = S - 1 - i
        t = jnp.full((B,), int(ddim.timesteps[step]), jnp.int32)
        t1 = t[:1]
        bank = model.apply(params, ref, t1, ctx, method=model.compute_bank)
        if deep_refresh[step]:
            eps_c, deep = model.apply(params, x, t, ctx_b, bank=bank,
                                      pose_hint=hint, collect_deep=True)
        else:
            eps_c = model.apply(params, x, t, ctx_b, bank=bank,
                                pose_hint=hint, deep_cache_in=deep)
        if refresh[step]:
            if udeep[step]:
                eps_u, deep_u = model.apply(params, x, t, uctx_b, uc=True,
                                            collect_deep=True)
            else:
                eps_u = model.apply(params, x, t, uctx_b, uc=True,
                                    deep_cache_in=deep_u)
        if active[step]:
            eps = eps_u + scfg.cfg_scale * (eps_c - eps_u)
        else:
            eps = eps_c
        x, _ = ddim_step(x, eps, ddim.alphas[step], ddim.alphas_prev[step],
                         ddim.sqrt_one_minus_alphas[step], ddim.sigmas[step],
                         jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               atol=2e-5, rtol=2e-5)


def test_dual_control_sampling():
    """DUAL_CONTROL end-to-end through the sampler (ref cldm.py:42-52
    image_control + :909 ControlLDMVideo heads): the image-hint branch must
    reach the scan, change the trajectory, and survive the turbo
    control-residual cache (which holds the SUMMED pose+image tuple)."""
    from magicdance_tpu.config import ControlNetConfig

    cfg = tiny_cfg(variant=ModelVariant.DUAL_CONTROL)
    cfg = ModelConfig(
        variant=ModelVariant.DUAL_CONTROL,
        unet=cfg.unet, pose_control=cfg.pose_control,
        image_control=ControlNetConfig(
            model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1, 2), num_heads=2, context_dim=16),
        vae=cfg.vae, clip=cfg.clip, latent_size=8, dtype="float32",
    )
    model = MagicPoseModel(cfg)
    B = 2
    x = jnp.zeros((B, 8, 8, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx0 = jnp.zeros((B, 5, 16))
    pose = jnp.zeros((B, 64, 64, 3))
    img = jnp.zeros((B, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx0,
                        pose_hint=pose, image_hint=img)
    params = randomize_zero_kernels(params)

    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 3)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    pose = jax.random.uniform(jax.random.PRNGKey(3), (B, 64, 64, 3))
    img = jax.random.uniform(jax.random.PRNGKey(4), (B, 64, 64, 3))
    scfg = SampleConfig(steps=3, cfg_scale=7.0)

    both = ddim_sample(model, params, sched, ddim, scfg,
                       jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                       pose_hint=pose, image_hint=img)
    both2 = ddim_sample(model, params, sched, ddim, scfg,
                        jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                        pose_hint=pose, image_hint=img)
    assert both.shape == (B, 8, 8, 4)
    assert np.isfinite(np.asarray(both)).all()
    np.testing.assert_array_equal(np.asarray(both), np.asarray(both2))
    # the image branch actually steers the trajectory
    pose_only = ddim_sample(model, params, sched, ddim, scfg,
                            jax.random.PRNGKey(5), x_T, ctx,
                            jnp.zeros_like(ctx), pose_hint=pose)
    assert not np.allclose(np.asarray(both), np.asarray(pose_only), atol=1e-4)
    # image-hint-only (no pose) exercises the res=None -> image path
    img_only = ddim_sample(model, params, sched, ddim, scfg,
                           jax.random.PRNGKey(5), x_T, ctx,
                           jnp.zeros_like(ctx), image_hint=img)
    assert np.isfinite(np.asarray(img_only)).all()
    assert not np.allclose(np.asarray(img_only), np.asarray(both), atol=1e-4)

    # turbo control-residual reuse: every-step refresh == exact; stride-2
    # runs, is deterministic, differs from exact
    t1 = ddim_sample(model, params, sched, ddim,
                     SampleConfig(steps=3, cfg_scale=7.0,
                                  cfg_interval=(0.0, 1.0), pose_every=1),
                     jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                     pose_hint=pose, image_hint=img)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(both),
                               atol=1e-5, rtol=1e-5)
    s2 = SampleConfig(steps=3, cfg_scale=7.0, pose_every=2)
    o1 = ddim_sample(model, params, sched, ddim, s2, jax.random.PRNGKey(5),
                     x_T, ctx, jnp.zeros_like(ctx),
                     pose_hint=pose, image_hint=img)
    o2 = ddim_sample(model, params, sched, ddim, s2, jax.random.PRNGKey(5),
                     x_T, ctx, jnp.zeros_like(ctx),
                     pose_hint=pose, image_hint=img)
    assert np.isfinite(np.asarray(o1)).all()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(both), atol=1e-4)

    # fused-CFG path threads the image hint too
    fused = ddim_sample(model, params, sched, ddim,
                        SampleConfig(steps=3, cfg_scale=7.0, fused_cfg=True),
                        jax.random.PRNGKey(5), x_T, ctx, jnp.zeros_like(ctx),
                        pose_hint=pose, image_hint=img)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(both),
                               atol=3e-5, rtol=3e-5)


def test_deepcache_level1():
    """Second DeepCache split point (deep_level=1): shallow pass over levels
    0-1 fed the deep feature of the SAME (x, t) reproduces the full forward;
    the sampler runs with deepcache_level=1 and differs from both exact and
    level-0 trajectories."""
    cfg3 = ModelConfig(
        variant=ModelVariant.APPEARANCE_POSE,
        unet=UNetConfig(model_channels=32, channel_mult=(1, 2, 2),
                        num_res_blocks=1, attention_resolutions=(1, 2),
                        num_heads=2, context_dim=16),
        pose_control=ControlNetConfig(model_channels=32, channel_mult=(1, 2, 2),
                                      num_res_blocks=1,
                                      attention_resolutions=(1, 2),
                                      num_heads=2, context_dim=16),
        vae=VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1),
        clip=CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                            num_heads=2, max_length=5),
        latent_size=8,
        dtype="float32",
    )
    model, params = init_model(cfg3, B=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([500, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    bank = model.apply(params, ref, t[:1], ctx[:1], method=model.compute_bank)
    full = model.apply(params, x, t, ctx, bank=bank, pose_hint=hint)
    for lvl in (0, 1):
        out_cd, deep = model.apply(params, x, t, ctx, bank=bank,
                                   pose_hint=hint, collect_deep=True,
                                   deep_level=lvl)
        np.testing.assert_allclose(np.asarray(out_cd), np.asarray(full),
                                   atol=1e-6)
        shallow = model.apply(params, x, t, ctx, bank=bank, pose_hint=hint,
                              deep_cache_in=deep, deep_level=lvl)
        np.testing.assert_allclose(np.asarray(shallow), np.asarray(full),
                                   atol=3e-5, rtol=3e-5)
    # level-1 cache is a bigger tensor from a shallower point than level-0
    _, deep0 = model.apply(params, x, t, ctx, bank=bank, pose_hint=hint,
                           collect_deep=True, deep_level=0)
    _, deep1 = model.apply(params, x, t, ctx, bank=bank, pose_hint=hint,
                           collect_deep=True, deep_level=1)
    assert deep0.shape != deep1.shape

    sched = make_schedule(cfg3.diffusion)
    ddim = make_ddim_schedule(sched, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4))
    outs = {}
    for lvl in (0, 1):
        scfg = SampleConfig(steps=4, cfg_scale=7.0, deepcache_every=2,
                            deepcache_level=lvl)
        o1 = ddim_sample(model, params, sched, ddim, scfg,
                         jax.random.PRNGKey(6), x_T, ctx[:1],
                         jnp.zeros((1, 5, 16)),
                         reference_latent=ref, pose_hint=hint)
        o2 = ddim_sample(model, params, sched, ddim, scfg,
                         jax.random.PRNGKey(6), x_T, ctx[:1],
                         jnp.zeros((1, 5, 16)),
                         reference_latent=ref, pose_hint=hint)
        assert np.isfinite(np.asarray(o1)).all()
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        outs[lvl] = np.asarray(o1)
    exact = ddim_sample(model, params, sched, ddim,
                        SampleConfig(steps=4, cfg_scale=7.0),
                        jax.random.PRNGKey(6), x_T, ctx[:1],
                        jnp.zeros((1, 5, 16)),
                        reference_latent=ref, pose_hint=hint)
    assert not np.allclose(outs[0], np.asarray(exact), atol=1e-4)
    assert not np.allclose(outs[1], np.asarray(exact), atol=1e-4)
    assert not np.allclose(outs[0], outs[1], atol=1e-4)
    # level-1 shallow recomputes more of the net -> closer to exact
    assert (np.abs(outs[1] - np.asarray(exact)).mean()
            < np.abs(outs[0] - np.asarray(exact)).mean())


def test_downsample_bank_helper():
    """downsample_bank pools square sites >= min_seq by exact 2x2 means and
    passes everything else through untouched."""
    from magicdance_tpu.sampling.ddim import downsample_bank

    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.randn(2, 64, 5).astype(np.float32))   # 8x8 site
    small = jnp.asarray(rng.randn(2, 16, 5).astype(np.float32))  # 4x4 site
    odd = jnp.asarray(rng.randn(2, 20, 5).astype(np.float32))    # non-square
    bank = (big, small, odd)

    out = downsample_bank(bank, 2, min_seq=64)
    assert out[0].shape == (2, 16, 5)
    assert out[1].shape == (2, 16, 5) and out[1] is small
    assert out[2].shape == (2, 20, 5) and out[2] is odd
    # pooled token (0,0) is the mean of spatial (0,0),(0,1),(1,0),(1,1)
    grid = np.asarray(big).reshape(2, 8, 8, 5)
    want = grid[:, :2, :2].mean(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out[0][:, 0]), want, rtol=1e-6)

    # factor 1 and a too-high threshold are both identity
    assert downsample_bank(bank, 1, min_seq=1)[0] is big
    assert downsample_bank(bank, 2, min_seq=4096)[0] is big
    assert downsample_bank(None, 2) is None


def test_bank_downsample_sampling():
    """bank_downsample: runs deterministic + finite through both the exact
    scan and the turbo scan (incl. bank reuse), diverges from exact, and a
    threshold above every site is exactly exact."""
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))

    def run(scfg):
        return np.asarray(ddim_sample(
            model, params, sched, ddim, scfg, jax.random.PRNGKey(5),
            x_T, ctx, jnp.zeros_like(ctx),
            reference_latent=ref, pose_hint=hint))

    exact = run(SampleConfig(steps=4, cfg_scale=7.0))
    # threshold above the largest site (8x8=64 tokens): identity
    same = run(SampleConfig(steps=4, cfg_scale=7.0, bank_downsample=2,
                            bank_downsample_min_seq=4096))
    np.testing.assert_array_equal(same, exact)

    scfg = SampleConfig(steps=4, cfg_scale=7.0, bank_downsample=2,
                        bank_downsample_min_seq=64)
    o1, o2 = run(scfg), run(scfg)
    assert np.isfinite(o1).all()
    np.testing.assert_array_equal(o1, o2)
    assert not np.allclose(o1, exact, atol=1e-4)

    # stacked with the turbo scan (bank reuse carries the POOLED bank)
    o3 = run(SampleConfig(steps=4, cfg_scale=7.0, bank_downsample=2,
                          bank_downsample_min_seq=64, bank_every=2,
                          uncond_every=2, cfg_interval=(0.1, 0.95)))
    assert np.isfinite(o3).all()


def test_bank_downsample_video():
    """bank_downsample applies to the overlap-window video sampler."""
    cfg = tiny_cfg(motion=True)
    model, params = init_model(cfg, B=4)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 3)
    F = 6
    x_T = jax.random.normal(jax.random.PRNGKey(1), (F, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (F, 64, 64, 3))
    scfg = SampleConfig(steps=3, cfg_scale=7.0, window=4, stride=3,
                        bank_downsample=2, bank_downsample_min_seq=64,
                        bank_every=2)
    out = ddim_sample_video(model, params, sched, ddim, scfg,
                            jax.random.PRNGKey(5), x_T, ctx,
                            jnp.zeros_like(ctx),
                            reference_latent=ref, pose_hint=hint)
    assert out.shape == (F, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_self_kv_downsample_sampling():
    """self_kv_downsample: factor 1 / too-high threshold are exactly exact;
    factor 2 runs deterministic + finite through exact and turbo scans and
    diverges from exact (static ToMe-style self-KV pooling)."""
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))

    def run(scfg):
        return np.asarray(ddim_sample(
            model, params, sched, ddim, scfg, jax.random.PRNGKey(5),
            x_T, ctx, jnp.zeros_like(ctx),
            reference_latent=ref, pose_hint=hint))

    exact = run(SampleConfig(steps=4, cfg_scale=7.0))
    np.testing.assert_array_equal(
        run(SampleConfig(steps=4, cfg_scale=7.0, self_kv_downsample=1)),
        exact)
    # threshold above the largest site (8x8=64 tokens): identity
    np.testing.assert_array_equal(
        run(SampleConfig(steps=4, cfg_scale=7.0, self_kv_downsample=2,
                         self_kv_min_seq=4096)),
        exact)

    scfg = SampleConfig(steps=4, cfg_scale=7.0, self_kv_downsample=2,
                        self_kv_min_seq=64)
    o1, o2 = run(scfg), run(scfg)
    assert np.isfinite(o1).all()
    np.testing.assert_array_equal(o1, o2)
    assert not np.allclose(o1, exact, atol=1e-4)

    # composes with the full turbo stack (incl. pooled bank)
    o3 = run(SampleConfig(steps=4, cfg_scale=7.0, self_kv_downsample=2,
                          self_kv_min_seq=64, bank_downsample=2,
                          bank_downsample_min_seq=64, bank_every=2,
                          uncond_every=2, deepcache_every=2,
                          cfg_interval=(0.1, 0.95)))
    assert np.isfinite(o3).all()
    # fused_cfg is rejected (gated bank_mask kernel has no pooled variant)
    with pytest.raises(AssertionError):
        run(SampleConfig(steps=4, cfg_scale=7.0, self_kv_downsample=2,
                         self_kv_min_seq=64, fused_cfg=True))


def test_self_kv_downsample_video():
    """self_kv_downsample applies to the overlap-window video sampler."""
    cfg = tiny_cfg(motion=True)
    model, params = init_model(cfg, B=4)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 3)
    F = 6
    x_T = jax.random.normal(jax.random.PRNGKey(1), (F, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (F, 64, 64, 3))
    scfg = SampleConfig(steps=3, cfg_scale=7.0, window=4, stride=3,
                        self_kv_downsample=2, self_kv_min_seq=64)
    out = ddim_sample_video(model, params, sched, ddim, scfg,
                            jax.random.PRNGKey(5), x_T, ctx,
                            jnp.zeros_like(ctx),
                            reference_latent=ref, pose_hint=hint)
    assert out.shape == (F, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
