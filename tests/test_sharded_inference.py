"""Frame-parallel inference over the 8-device mesh: pose frames sharded on
'data', the appearance bank computed once (batch 1, replicated) — the
BASELINE.json north-star serving layout. Outputs must equal the single-device
run."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from magicdance_tpu.config import SampleConfig
from magicdance_tpu.ops.schedules import make_ddim_schedule, make_schedule
from magicdance_tpu.parallel.mesh import make_mesh
from magicdance_tpu.sampling.ddim import ddim_sample

from test_sampling import init_model, tiny_cfg


def test_frame_sharded_sampling_matches_single_device():
    cfg = tiny_cfg()
    F = 8  # one frame per device
    model, params = init_model(cfg, B=F)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 3)
    scfg = SampleConfig(steps=3, cfg_scale=7.0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (F, 8, 8, 4))
    ctx = jnp.zeros((1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(3), (F, 64, 64, 3))

    ref_out = ddim_sample(model, params, sched, ddim, scfg,
                          jax.random.PRNGKey(4), x_T, ctx, ctx,
                          reference_latent=ref, pose_hint=hint)

    mesh = make_mesh(("data",))
    frames_sh = NamedSharding(mesh, P("data", None, None, None))
    repl = NamedSharding(mesh, P())
    x_sh = jax.device_put(x_T, frames_sh)
    hint_sh = jax.device_put(hint, frames_sh)
    ref_sh = jax.device_put(ref, repl)
    ctx_sh = jax.device_put(ctx, repl)
    params_sh = jax.device_put(params, repl)

    fn = jax.jit(lambda p, x, c, r, h: ddim_sample(
        model, p, sched, ddim, scfg, jax.random.PRNGKey(4), x, c, c,
        reference_latent=r, pose_hint=h))
    out = fn(params_sh, x_sh, ctx_sh, ref_sh, hint_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-4)


def test_window_sharded_video_sampling_matches_single_device():
    """Multi-chip video serving layout: overlap windows sharded on 'data'
    per DDIM step, frame-space latents replicated; scatter-average is the
    one cross-device collective per step. Exact vs single-device."""
    from magicdance_tpu.config import ModelVariant
    from magicdance_tpu.sampling.overlap import ddim_sample_video

    cfg = tiny_cfg(variant=ModelVariant.APPEARANCE_POSE_TEMPORAL, motion=True)
    F = 8
    model, params = init_model(cfg, B=F)
    sched = make_schedule(cfg.diffusion)
    ddim = make_ddim_schedule(sched, 3)
    # window=4, stride=2 -> 4 windows x 4 frames = 16 rows over 8 devices
    scfg = SampleConfig(steps=3, cfg_scale=7.0, window=4, stride=2)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (F, 8, 8, 4))
    ctx = jnp.zeros((1, 5, 16))
    ref = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(3), (F, 64, 64, 3))

    ref_out = ddim_sample_video(model, params, sched, ddim, scfg,
                                jax.random.PRNGKey(4), x_T, ctx, ctx,
                                reference_latent=ref, pose_hint=hint)

    mesh = make_mesh(("data",))
    win_sh = NamedSharding(mesh, P("data"))
    fn = jax.jit(lambda p, x, c, r, h: ddim_sample_video(
        model, p, sched, ddim, scfg, jax.random.PRNGKey(4), x, c, c,
        reference_latent=r, pose_hint=h, window_sharding=win_sh))
    out = fn(params, x_T, ctx, ref, hint)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-4)
