"""PLMS (pseudo linear multistep) sampler as a lax.scan.

Rebuild of the reference's PLMS sampler (ref: ldm/models/diffusion/plms.py —
4th-order Adams-Bashforth over eps predictions with Runge-Kutta bootstrap;
unused by the MagicPose entry points but part of the sampler surface).
The eps-history buffer rides the scan carry as a fixed (4, ...) array.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from magicdance_tpu.config import Parameterization, SampleConfig
from magicdance_tpu.ops.schedules import (
    DDIMSchedule,
    DiffusionSchedule,
    predict_eps_from_v,
    q_sample,
)
from magicdance_tpu.sampling.ddim import ddim_step


def plms_sample(
    model: Any,
    params: Any,
    sched: DiffusionSchedule,
    ddim: DDIMSchedule,
    scfg: SampleConfig,
    rng: jax.Array,
    x_T: jax.Array,
    context: jax.Array,
    uncond_context: Optional[jax.Array] = None,
    *,
    reference_latent: Optional[jax.Array] = None,
    pose_hint: Optional[jax.Array] = None,
    parameterization: Parameterization = Parameterization.EPS,
) -> jax.Array:
    """Multistep eps combination: e' = (55 e_t - 59 e_{t-1} + 37 e_{t-2}
    - 9 e_{t-3}) / 24 once 4 evals exist; lower-order warm-up before."""
    B = x_T.shape[0]
    S = ddim.num_steps
    use_cfg = scfg.cfg_scale != 1.0 and uncond_context is not None

    def tile(c):
        if c is None:
            return None
        return jnp.broadcast_to(c, (B,) + c.shape[1:]) if c.shape[0] == 1 else c

    ctx, uctx = tile(context), tile(uncond_context)
    ref_ctx = context[:1] if context is not None else None
    has_appearance = reference_latent is not None and model.cfg.has_appearance

    def eps_at(x, t_scalar, step_rng):
        t = jnp.full((B,), t_scalar, jnp.int32)
        bank = None
        if has_appearance:
            if scfg.wonoise:
                ref_noisy = reference_latent
            else:
                noise = jax.random.normal(step_rng, reference_latent.shape,
                                          reference_latent.dtype)
                tr = jnp.full((reference_latent.shape[0],), t_scalar, jnp.int32)
                ref_noisy = q_sample(sched, reference_latent, tr, noise)
            bank = model.apply(
                params, ref_noisy,
                jnp.full((reference_latent.shape[0],), t_scalar, jnp.int32),
                ref_ctx, method=model.compute_bank)
        e = model.apply(params, x, t, ctx, bank=bank, pose_hint=pose_hint)
        if parameterization is Parameterization.V:
            e = predict_eps_from_v(sched, x, t, e)
        if use_cfg:
            eu = model.apply(params, x, t, uctx, uc=True)
            if parameterization is Parameterization.V:
                eu = predict_eps_from_v(sched, x, t, eu)
            e = eu + scfg.cfg_scale * (e - eu)
        return e

    def body(carry, i):
        x, hist, n_hist, step_rng = carry
        step = S - 1 - i
        t_scalar = ddim.timesteps[step]
        step_rng, r1 = jax.random.split(step_rng)
        e_t = eps_at(x, t_scalar, r1)

        # multistep combination by available history depth
        e1 = hist[0]
        e2 = hist[1]
        e3 = hist[2]
        e_prime = jnp.select(
            [n_hist >= 3, n_hist == 2, n_hist == 1],
            [
                (55 * e_t - 59 * e1 + 37 * e2 - 9 * e3) / 24,
                (23 * e_t - 16 * e1 + 5 * e2) / 12,
                (3 * e_t - e1) / 2,
            ],
            e_t,
        )
        x_prev, _ = ddim_step(
            x, e_prime, ddim.alphas[step], ddim.alphas_prev[step],
            ddim.sqrt_one_minus_alphas[step], ddim.sigmas[step],
            jnp.zeros_like(x),
        )
        new_hist = jnp.stack([e_t, hist[0], hist[1]])
        return (x_prev, new_hist, jnp.minimum(n_hist + 1, 3), step_rng), None

    hist0 = jnp.zeros((3,) + x_T.shape, x_T.dtype)
    (x0, _, _, _), _ = jax.lax.scan(
        body, (x_T, hist0, jnp.zeros((), jnp.int32), rng), jnp.arange(S)
    )
    return x0
