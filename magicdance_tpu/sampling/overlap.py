"""Sliding-window ("overlap") DDIM sampling for long video sequences.

TPU rebuild of the reference's AnimateDiff overlap sampling
(ref: ldm/models/diffusion/ddim.py:569-594; prototype
overlap_sampling.py:1-19): the temporal UNet sees fixed 16-frame windows;
longer sequences are covered by windows of stride 12 whose per-frame eps
predictions are averaged (scatter-add + counts) before the DDIM update. The
reference accumulates on CPU python-side per window; here every step
processes ALL windows as one batched model call inside the same `lax.scan`
— static window index arrays, one compiled program.

The reference draws a random cyclic offset per step (ddim.py:573-576) to
rotate window boundaries; we keep that (rng-driven, static window count).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from magicdance_tpu.config import Parameterization, SampleConfig
from magicdance_tpu.ops.schedules import (
    DDIMSchedule,
    DiffusionSchedule,
    predict_eps_from_v,
    q_sample,
)
from magicdance_tpu.sampling.ddim import ddim_step


def window_starts(num_frames: int, window: int, stride: int) -> np.ndarray:
    """Cyclic window starts covering [0, F) (static)."""
    if num_frames <= window:
        return np.array([0])
    n = int(np.ceil(num_frames / stride))
    return (np.arange(n) * stride) % num_frames


def ddim_sample_video(
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
    image_hint: Optional[jax.Array] = None,
    parameterization: Parameterization = Parameterization.EPS,
) -> jax.Array:
    """x_T: (F, h, w, 4) for a video of F frames; windows of scfg.window
    frames are denoised jointly through the temporal UNet and averaged."""
    F = x_T.shape[0]
    W = min(scfg.window, F)
    starts = jnp.asarray(window_starts(F, scfg.window, scfg.stride))
    n_win = starts.shape[0]
    S = ddim.num_steps
    use_cfg = scfg.cfg_scale != 1.0 and uncond_context is not None

    def tile(c, n):
        if c is None:
            return None
        return jnp.broadcast_to(c, (n,) + c.shape[1:]) if c.shape[0] == 1 else c

    win_ctx = tile(context, n_win * W)
    win_uctx = tile(uncond_context, n_win * W)
    ref_ctx = context[:1] if context is not None else None
    has_appearance = reference_latent is not None and model.cfg.has_appearance

    def to_eps(out, x, t):
        if parameterization is Parameterization.V:
            return predict_eps_from_v(sched, x, t, out)
        return out

    def body(carry, i):
        x, step_rng = carry
        step = S - 1 - i
        t_scalar = ddim.timesteps[step]
        step_rng, rng_off, rng_ref, rng_sig = jax.random.split(step_rng, 4)

        # random cyclic offset rotates window boundaries per step
        offset = jax.random.randint(rng_off, (), 0, F)
        idx = (starts[:, None] + offset + jnp.arange(W)[None, :]) % F  # (n_win, W)
        flat_idx = idx.reshape(-1)

        xw = x[flat_idx]  # (n_win*W, h, w, 4)
        t = jnp.full((xw.shape[0],), t_scalar, jnp.int32)

        bank = None
        if has_appearance:
            if scfg.wonoise:
                ref_noisy = reference_latent
            else:
                ref_noise = jax.random.normal(
                    rng_ref, reference_latent.shape, reference_latent.dtype)
                ref_noisy = q_sample(
                    sched, reference_latent,
                    jnp.full((reference_latent.shape[0],), t_scalar, jnp.int32),
                    ref_noise)
            bank = model.apply(
                params, ref_noisy,
                jnp.full((reference_latent.shape[0],), t_scalar, jnp.int32),
                ref_ctx, method=model.compute_bank)

        hint_w = pose_hint[flat_idx] if pose_hint is not None else None
        ihint_w = image_hint[flat_idx] if image_hint is not None else None
        eps_c = model.apply(params, xw, t, win_ctx, bank=bank,
                            pose_hint=hint_w, image_hint=ihint_w,
                            num_frames=W)
        eps_c = to_eps(eps_c, xw, t)
        if use_cfg:
            eps_u = model.apply(params, xw, t, win_uctx, uc=True, num_frames=W)
            eps_u = to_eps(eps_u, xw, t)
            eps_w = eps_u + scfg.cfg_scale * (eps_c - eps_u)
        else:
            eps_w = eps_c

        # scatter-average window predictions back to the frame axis
        # (ref ddim.py:586-594 pred_all/counts)
        zeros = jnp.zeros_like(x)
        eps_sum = zeros.at[flat_idx].add(eps_w)
        counts = jnp.zeros((F,), jnp.float32).at[flat_idx].add(1.0)
        eps = eps_sum / counts[:, None, None, None]

        noise = (jax.random.normal(rng_sig, x.shape, x.dtype)
                 if scfg.eta > 0 else jnp.zeros_like(x))
        x_prev, _ = ddim_step(
            x, eps, ddim.alphas[step], ddim.alphas_prev[step],
            ddim.sqrt_one_minus_alphas[step], ddim.sigmas[step], noise)
        return (x_prev, step_rng), None

    (x0, _), _ = jax.lax.scan(body, (x_T, rng), jnp.arange(S))
    return x0
