"""Round-5 sampler tests, split from test_sampling.py: one pytest process
loading too many XLA CPU AOT executables trips the deterministic
cache-deserialize abort documented in scripts/run_tests.sh — splitting the
module bounds executables per process (same remedy as the tier runner)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdance_tpu.config import SampleConfig
from magicdance_tpu.ops.schedules import make_ddim_schedule, make_schedule
from magicdance_tpu.sampling.ddim import ddim_sample
from magicdance_tpu.sampling.overlap import ddim_sample_video

from test_sampling import init_model, tiny_cfg


def test_overlap_video_pose_deepcache():
    """Round 5: pose_every / deepcache_every apply to the video sampler via
    per-ABSOLUTE-frame caches (scatter-averaged to the frame axis, gathered
    through the current rotated window layout — so even refresh steps read
    the frame-averaged values, by design). Strided variants must run, be
    deterministic, and differ from the exact path."""
    import numpy as np

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
    for scfg in (
        SampleConfig(steps=3, cfg_scale=7.0, window=W, stride=3,
                     pose_every=2),
        SampleConfig(steps=3, cfg_scale=7.0, window=W, stride=3,
                     deepcache_every=2),
        SampleConfig(steps=3, cfg_scale=7.0, window=W, stride=3,
                     pose_every=2, deepcache_every=2, uncond_every=2,
                     bank_every=2, cfg_interval=(0.1, 0.95)),
    ):
        o1 = ddim_sample_video(model, params, sched, ddim, scfg,
                               jax.random.PRNGKey(5), x_T, ctx, uctx, **kw)
        o2 = ddim_sample_video(model, params, sched, ddim, scfg,
                               jax.random.PRNGKey(5), x_T, ctx, uctx, **kw)
        assert np.isfinite(np.asarray(o1)).all()
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        assert not np.allclose(np.asarray(o1), np.asarray(exact), atol=1e-4)


def test_reuse_exact_endpoints_schedule():
    """reuse_exact_first/_last force every cache to refresh at the
    trajectory endpoints regardless of stride."""
    import numpy as np

    from magicdance_tpu.sampling.ddim import build_turbo_schedules

    scfg = SampleConfig(steps=10, deepcache_every=4, pose_every=4,
                        bank_every=4, uncond_every=3,
                        reuse_exact_first=2, reuse_exact_last=2)
    S = 10
    ts = np.linspace(999, 1, S).astype(int)
    (active, refresh, pose_r, deep_r, udeep_r, bank_r) = \
        build_turbo_schedules(scfg, 1000, ts, use_cfg=True)
    # executed order is descending t: i_exec -> step index S-1-i_exec
    for i_exec in (0, 1, 8, 9):
        step = S - 1 - i_exec
        assert pose_r[step] and deep_r[step] and bank_r[step]
        assert refresh[step] and udeep_r[step]
    # mid-range keeps the stride (step i_exec=3 not a refresh multiple)
    assert not deep_r[S - 1 - 3] and not pose_r[S - 1 - 3]

    # sampler runs and is exact-equal when strides are 1 (schedule-only change)
    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    uctx = jnp.zeros_like(ctx)
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    kw = dict(reference_latent=ref, pose_hint=hint)
    exact = ddim_sample(model, params, sched, ddim,
                        SampleConfig(steps=4, cfg_scale=7.0),
                        jax.random.PRNGKey(5), x_T, ctx, uctx, **kw)
    # endpoint-exact stride: with exact_first+exact_last covering ALL steps,
    # every cache refreshes every step -> identical to exact
    o = ddim_sample(model, params, sched, ddim,
                    SampleConfig(steps=4, cfg_scale=7.0, deepcache_every=3,
                                 pose_every=3, bank_every=3,
                                 reuse_exact_first=2, reuse_exact_last=2),
                    jax.random.PRNGKey(5), x_T, ctx, uctx, **kw)
    np.testing.assert_allclose(np.asarray(o), np.asarray(exact),
                               atol=2e-5, rtol=2e-5)


def test_dpmpp_3m_sampler():
    """DPM-Solver++ 3M: golden trajectory vs an independent eager-loop
    implementation of the same update (no scan, straight numpy-style),
    plus SDE variant sanity (finite, deterministic, differs from ODE)."""
    import numpy as np

    from magicdance_tpu.sampling.dpm import dpmpp_3m_sample

    cfg = tiny_cfg()
    model, params = init_model(cfg, B=2)
    sched = make_schedule(cfg.diffusion)
    scfg = SampleConfig(steps=6, cfg_scale=7.0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    uctx = jnp.zeros_like(ctx)
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    kw = dict(reference_latent=ref, pose_hint=hint)

    out = dpmpp_3m_sample(model, params, sched, 6, scfg,
                          jax.random.PRNGKey(5), x_T, ctx, uctx, **kw)
    assert np.isfinite(np.asarray(out)).all()

    # ---- independent eager reimplementation (history as Python vars) ----
    acp = np.asarray(sched.alphas_cumprod)
    T = acp.shape[0]
    ts = np.linspace(T - 1, 0, 7).round().astype(np.int32)
    al = np.sqrt(acp[ts])
    si = np.sqrt(1.0 - acp[ts])
    lam = np.log(al) - np.log(si)

    def x0_of(x, t_scalar):
        B = x.shape[0]
        t = jnp.full((B,), int(t_scalar), jnp.int32)
        bank = model.apply(params, ref,
                           jnp.full((1,), int(t_scalar), jnp.int32),
                           ctx[:1], method=model.compute_bank)
        e = model.apply(params, x, t, jnp.broadcast_to(ctx, (B, 5, 16)),
                        bank=bank, pose_hint=hint)
        eu = model.apply(params, x, t, jnp.broadcast_to(uctx, (B, 5, 16)),
                        uc=True)
        e = eu + 7.0 * (e - eu)
        a = float(np.sqrt(acp[int(t_scalar)]))
        s = float(np.sqrt(1.0 - acp[int(t_scalar)]))
        return (x - s * e) / a

    x = x_T
    x0_1 = x0_2 = None
    for i in range(6):
        x0 = x0_of(x, ts[i])
        h = lam[i + 1] - lam[i]
        phi_1 = np.expm1(-h)
        phi_2 = phi_1 / h + 1.0
        phi_3 = phi_2 / h - 0.5
        if x0_2 is not None:
            h_1 = lam[i] - lam[i - 1]
            h_2 = lam[i - 1] - lam[i - 2]
            r0, r1 = h_1 / h, h_2 / h
            d1_0 = (x0 - x0_1) / r0
            d1_1 = (x0_1 - x0_2) / r1
            d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
            d2 = (d1_0 - d1_1) / (r0 + r1)
            corr = phi_2 * d1 - phi_3 * d2
        elif x0_1 is not None:
            h_1 = lam[i] - lam[i - 1]
            d1_0 = (x0 - x0_1) / (h_1 / h)
            corr = phi_2 * d1_0
        else:
            corr = jnp.zeros_like(x0)
        x = (si[i + 1] / si[i] * x - al[i + 1] * phi_1 * x0
             + al[i + 1] * corr)
        x0_2, x0_1 = x0_1, x0
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_1),
                               atol=2e-4, rtol=2e-4)

    # SDE variant: finite, deterministic under the same key, differs
    s1 = dpmpp_3m_sample(model, params, sched, 6, scfg,
                         jax.random.PRNGKey(5), x_T, ctx, uctx,
                         sde_eta=1.0, **kw)
    s2 = dpmpp_3m_sample(model, params, sched, 6, scfg,
                         jax.random.PRNGKey(5), x_T, ctx, uctx,
                         sde_eta=1.0, **kw)
    assert np.isfinite(np.asarray(s1)).all()
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert not np.allclose(np.asarray(s1), np.asarray(out), atol=1e-4)
