"""Diffusion schedules and forward-process math as pure functions.

TPU-first rewrite of the reference's buffer-registering DDPM schedule code
(ref: ldm/models/diffusion/ddpm.py:138 `register_schedule`,
ldm/modules/diffusionmodules/util.py:20-99 `make_beta_schedule` /
`make_ddim_timesteps` / `make_ddim_sampling_parameters`). Instead of mutable
module buffers, everything lives in an immutable `DiffusionSchedule` pytree
that is closed over by jitted functions; all per-timestep gathers are static
`jnp.take` ops that fuse cleanly under `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from magicdance_tpu.config import DiffusionConfig, Parameterization


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedules matching the reference semantics (util.py:20-45).

    "linear" is the SD convention: linear in sqrt(beta) space.
    """
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
        )
    elif schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(steps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas


class DiffusionSchedule(NamedTuple):
    """All derived schedule arrays, shape (T,), float32."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    lvlb_weights: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(cfg: DiffusionConfig) -> DiffusionSchedule:
    """Derived arrays exactly as DDPM.register_schedule (ddpm.py:138-196)."""
    betas = make_beta_schedule(
        cfg.beta_schedule,
        cfg.timesteps,
        linear_start=cfg.linear_start,
        linear_end=cfg.linear_end,
        cosine_s=cfg.cosine_s,
    )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = (1 - cfg.v_posterior) * betas * (
        1.0 - alphas_cumprod_prev
    ) / (1.0 - alphas_cumprod) + cfg.v_posterior * betas
    posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))
    posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_coef2 = (
        (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    )

    if cfg.parameterization is Parameterization.EPS:
        # element 0 divides by posterior_variance[0]=0; overwritten below
        # (reference does the same, ddpm.py:186-188)
        with np.errstate(divide="ignore"):
            lvlb_weights = betas**2 / (
                2 * posterior_variance * alphas * (1 - alphas_cumprod)
            )
        lvlb_weights[0] = lvlb_weights[1]
    elif cfg.parameterization is Parameterization.X0:
        lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * (1 - alphas_cumprod))
    else:  # V
        lvlb_weights = np.ones_like(betas)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(posterior_mean_coef1),
        posterior_mean_coef2=f32(posterior_mean_coef2),
        lvlb_weights=f32(lvlb_weights),
    )


def _extract(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep scalars and broadcast to an image batch."""
    out = jnp.take(a, t)
    return out.reshape(t.shape + (1,) * (ndim - t.ndim))


def q_sample(
    sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """Forward diffusion q(x_t | x_0) (ref: ddpm.py:356-360)."""
    return (
        _extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def predict_start_from_noise(
    sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def get_v(
    sched: DiffusionSchedule, x: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """v-parameterization target (ref: ddpm.py get_v)."""
    return (
        _extract(sched.sqrt_alphas_cumprod, t, x.ndim) * noise
        - _extract(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim) * x
    )


def predict_eps_from_v(
    sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, v: jax.Array
) -> jax.Array:
    """eps from a v-prediction (ref: ddim.py:608-631 v support)."""
    return (
        _extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * v
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * x_t
    )


def predict_start_from_z_and_v(
    sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, v: jax.Array
) -> jax.Array:
    return (
        _extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
        - _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
    )


class DDIMSchedule(NamedTuple):
    """Per-sampling-step arrays, shape (S,), ordered t ascending."""

    timesteps: jax.Array  # int32 model timesteps
    alphas: jax.Array  # alpha_cumprod at each step
    alphas_prev: jax.Array
    sqrt_one_minus_alphas: jax.Array
    sigmas: jax.Array

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_ddim_schedule(
    sched: DiffusionSchedule,
    num_steps: int,
    eta: float = 0.0,
    method: str = "uniform",
) -> DDIMSchedule:
    """DDIM step selection + sampling parameters (util.py:47-99).

    Uniform method: c = T // S, timesteps = arange(0, T, c) + 1, matching the
    reference's `make_ddim_timesteps` (+1 shift included).
    """
    T = int(sched.num_timesteps)
    if method == "uniform":
        c = T // num_steps
        ddim_timesteps = np.arange(0, num_steps) * c + 1
    elif method == "quad":
        ddim_timesteps = ((np.linspace(0, np.sqrt(T * 0.8), num_steps)) ** 2).astype(int) + 1
    else:
        raise ValueError(f"unknown ddim discretization {method!r}")

    acp = np.asarray(sched.alphas_cumprod)
    alphas = acp[ddim_timesteps]
    alphas_prev = np.concatenate([[float(acp[0])], acp[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DDIMSchedule(
        timesteps=jnp.asarray(ddim_timesteps, dtype=jnp.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        sigmas=f32(sigmas),
    )


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: int = 10000, dtype=jnp.float32
) -> jax.Array:
    """Sinusoidal timestep embeddings (ref: util.py:189-210).

    Args:
      timesteps: (B,) int or float timestep values.
      dim: embedding dimension.
    Returns: (B, dim) array: [cos | sin] halves, zero-padded if dim is odd.
    """
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)
