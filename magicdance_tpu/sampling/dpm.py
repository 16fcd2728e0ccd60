"""DPM-Solver++(2M) sampler as a lax.scan.

Covers the reference's DPM-Solver surface
(ref: ldm/models/diffusion/dpm_solver/ — 1,239 LoC of NoiseSchedule +
multi-order solver machinery; unused by the MagicPose entry points). This is
the widely-used 2nd-order multistep variant (DPM-Solver++ 2M,
data-prediction formulation), which matches the reference solver's quality
at 15-25 steps while staying a single compiled scan.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from magicdance_tpu.config import Parameterization, SampleConfig
from magicdance_tpu.ops.schedules import (
    DiffusionSchedule,
    predict_eps_from_v,
    q_sample,
)


def dpmpp_2m_sample(
    model: Any,
    params: Any,
    sched: DiffusionSchedule,
    num_steps: int,
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
    """x_T: (B, h, w, 4). Uniform-lambda timestep selection over [T-1, 0]."""
    B = x_T.shape[0]
    acp = np.asarray(sched.alphas_cumprod)
    T = acp.shape[0]
    # uniform in t from T-1 → 0 (inclusive), S+1 knots
    ts = np.linspace(T - 1, 0, num_steps + 1).round().astype(np.int32)
    alphas = jnp.asarray(np.sqrt(acp[ts]), jnp.float32)  # alpha_t (signal)
    sigmas = jnp.asarray(np.sqrt(1.0 - acp[ts]), jnp.float32)
    lambdas = jnp.log(alphas) - jnp.log(sigmas)
    t_knots = jnp.asarray(ts, jnp.int32)

    use_cfg = scfg.cfg_scale != 1.0 and uncond_context is not None

    def tile(c):
        if c is None:
            return None
        return jnp.broadcast_to(c, (B,) + c.shape[1:]) if c.shape[0] == 1 else c

    ctx, uctx = tile(context), tile(uncond_context)
    ref_ctx = context[:1] if context is not None else None
    has_appearance = reference_latent is not None and model.cfg.has_appearance

    def x0_at(x, t_scalar, step_rng):
        """data prediction x0(x_t)"""
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
        a = jnp.take(jnp.sqrt(sched.alphas_cumprod), t_scalar)
        s = jnp.take(jnp.sqrt(1.0 - sched.alphas_cumprod), t_scalar)
        return (x - s * e) / a

    def body(carry, i):
        x, x0_prev, have_prev, step_rng = carry
        step_rng, r1 = jax.random.split(step_rng)
        x0 = x0_at(x, t_knots[i], r1)

        lam_cur, lam_next = lambdas[i], lambdas[i + 1]
        h = lam_next - lam_cur
        # second-order correction using the previous x0 prediction
        def order2():
            lam_prev = lambdas[jnp.maximum(i - 1, 0)]
            h_prev = lam_cur - lam_prev
            r = h_prev / jnp.maximum(h, 1e-8)
            denom = jnp.maximum(2.0 * r, 1e-8)
            return x0 + (x0 - x0_prev) / denom

        d = jnp.where(have_prev > 0, order2(), x0)
        x_next = (
            sigmas[i + 1] / sigmas[i] * x
            - alphas[i + 1] * jnp.expm1(-h) * d
        )
        return (x_next, x0, jnp.ones((), jnp.int32), step_rng), None

    (x_last, x0_last, _, _), _ = jax.lax.scan(
        body,
        (x_T, jnp.zeros_like(x_T), jnp.zeros((), jnp.int32), rng),
        jnp.arange(num_steps),
    )
    return x0_last
