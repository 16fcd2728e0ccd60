"""Latent-diffusion training losses as pure functions.

Functional rewrite of the reference's p_losses chain
(ref: ldm/models/diffusion/ddpm.py:2165-2212
LatentDiffusionReferenceOnly.p_losses, :382-412 DDPM.p_losses/get_loss):
sample t ~ U[0, T), noise the target latent, optionally noise the reference
latent (skipped under `wonoise`, ref ddpm.py:2173-2176), run the composite
denoiser, and take the weighted MSE against the eps / x0 / v target.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from magicdance_tpu.config import DiffusionConfig, Parameterization
from magicdance_tpu.ops.schedules import DiffusionSchedule, get_v, q_sample


def diffusion_loss(
    apply_fn: Callable[..., jax.Array],
    sched: DiffusionSchedule,
    dcfg: DiffusionConfig,
    rng: jax.Array,
    x_start: jax.Array,
    context: jax.Array,
    *,
    reference_latent: Optional[jax.Array] = None,
    pose_hint: Optional[jax.Array] = None,
    wonoise: bool = True,
    num_frames: int = 1,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """One training loss evaluation.

    apply_fn(x_noisy, t, context, reference_noisy=..., pose_hint=...,
    num_frames=...) -> model output; typically a partial of
    `MagicPoseModel.apply` with bound params.
    """
    b = x_start.shape[0]
    rng_t, rng_noise, rng_ref = jax.random.split(rng, 3)
    if num_frames > 1:
        # temporal: one timestep per clip, shared by its frames
        # (AnimateDiff convention; frames are folded as (B_clips*F, ...))
        t_clip = jax.random.randint(
            rng_t, (b // num_frames,), 0, sched.num_timesteps, dtype=jnp.int32
        )
        t = jnp.repeat(t_clip, num_frames)
    else:
        t = jax.random.randint(rng_t, (b,), 0, sched.num_timesteps,
                               dtype=jnp.int32)
    noise = jax.random.normal(rng_noise, x_start.shape, dtype=x_start.dtype)
    x_noisy = q_sample(sched, x_start, t, noise)

    reference_noisy = None
    if reference_latent is not None:
        if wonoise:
            reference_noisy = reference_latent
        else:
            stride = max(1, t.shape[0] // reference_latent.shape[0])
            t_ref = t[::stride][: reference_latent.shape[0]]
            ref_noise = jax.random.normal(
                rng_ref, reference_latent.shape, dtype=reference_latent.dtype
            )
            reference_noisy = q_sample(sched, reference_latent, t_ref, ref_noise)

    model_out = apply_fn(
        x_noisy, t, context,
        reference_noisy=reference_noisy, pose_hint=pose_hint, num_frames=num_frames,
    )

    if dcfg.parameterization is Parameterization.EPS:
        target = noise
    elif dcfg.parameterization is Parameterization.X0:
        target = x_start
    else:
        target = get_v(sched, x_start, noise, t)

    err = (model_out.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if dcfg.loss_type == "l1":
        err = jnp.abs(model_out.astype(jnp.float32) - target.astype(jnp.float32))
    loss_simple = err.reshape(b, -1).mean(axis=1)

    loss = dcfg.l_simple_weight * loss_simple.mean()
    metrics = {"loss_simple": loss_simple.mean(), "t_mean": t.astype(jnp.float32).mean()}
    if dcfg.original_elbo_weight > 0:
        lvlb = (jnp.take(sched.lvlb_weights, t) * loss_simple).mean()
        loss = loss + dcfg.original_elbo_weight * lvlb
        metrics["loss_vlb"] = lvlb
    metrics["loss"] = loss
    return loss, metrics
