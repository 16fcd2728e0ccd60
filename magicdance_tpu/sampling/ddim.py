"""DDIM sampling compiled to a single `lax.scan`.

TPU-first rewrite of DDIMSampler_ReferenceOnly
(ref: ldm/models/diffusion/ddim.py:346-645): the reference runs 50 Python
iterations, each dispatching 3 UNet-scale forwards (appearance write, main
cond read, plain uncond) plus a pose-CN forward; here the whole trajectory is
ONE compiled program — the step loop is `lax.scan`, per-step timestep values
are gathered from precomputed `DDIMSchedule` arrays, and the CFG structure is
static so exactly the needed UNet graph variants compile once each.

Structural wins over the reference on the frame axis: all F frames of a
sequence are one batch, and the appearance bank — which depends only on
(reference latent, t) — is computed ONCE per step for the whole frame batch
(batch-1 bank broadcast inside the attention kernel) instead of per frame.

Reference quirks preserved (SURVEY.md §7 "hard parts" #4):
  * `wonoise=True` skips re-noising the reference latent (ddpm.py:2173-2176);
    otherwise fresh noise is drawn every step (ddim.py:529-535).
  * `controlnet_important` CFG: the uncond pass drops BOTH control branches —
    vanilla SD forward (ddim.py:598-605, cldm.py:71-84).
  * shared x_T noise across frames is the caller's choice of x_T
    (test_any_image_pose.py:201-202).
  * v-parameterization eps conversion (ddim.py:608-631).
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


def build_turbo_schedules(
    scfg: SampleConfig,
    num_train_timesteps: int,
    timesteps,
    use_cfg: bool,
):
    """Host-side per-step masks for the turbo scan (static schedule arrays).

    Returns numpy bool arrays of shape (S,), indexed by SCHEDULE position
    (``step``; the scan executes steps in descending order, ``step = S-1-i``):

      active   — CFG is applied this step (cfg_interval gate, inclusive
                 ``[lo, hi]`` over t/num_train_timesteps)
      refresh  — the uncond eps is freshly computed (every ``uncond_every``-th
                 CFG-ACTIVE step)
      pose_refresh — pose-ControlNet residuals recomputed (every
                 ``pose_every``-th executed step)
      deep_refresh — cond-pass DeepCache deep levels recomputed (every
                 ``deepcache_every``-th executed step)
      udeep_refresh — uncond-pass DeepCache deep levels recomputed. Scheduled
                 over REFRESH-step ordinals (every
                 ceil(deepcache_every/uncond_every)-th refresh step), NOT as
                 ``refresh & deep_refresh``: the two schedules run on
                 different index bases (CFG-active steps vs all steps), so
                 their intersection can miss the first — or with unlucky
                 strides every — fresh-uncond step, leaving the shallow pass
                 reading the all-zeros cache init. The ordinal schedule
                 guarantees the FIRST fresh-uncond step is always a full pass.
      bank_refresh — the appearance bank (full-UNet-copy write pass) is
                 recomputed (every ``bank_every``-th executed step).
    """
    import numpy as np

    S = len(timesteps)
    ts = np.asarray(timesteps, dtype=np.float64)
    frac = ts / float(num_train_timesteps)
    lo, hi = scfg.cfg_interval if scfg.cfg_interval is not None else (0.0, 1.0)
    active = (frac >= lo) & (frac <= hi)
    if not use_cfg:
        active[:] = False
    refresh = np.zeros(S, dtype=bool)
    pose_refresh = np.zeros(S, dtype=bool)
    n_active = 0
    for i_exec in range(S):  # scan order: descending t
        step_exec = S - 1 - i_exec
        if active[step_exec]:
            if n_active % max(scfg.uncond_every, 1) == 0:
                refresh[step_exec] = True
            n_active += 1
        if i_exec % max(scfg.pose_every, 1) == 0:
            pose_refresh[step_exec] = True
    deep_refresh = np.zeros(S, dtype=bool)
    for i_exec in range(S):
        if i_exec % max(scfg.deepcache_every, 1) == 0:
            deep_refresh[S - 1 - i_exec] = True
    udeep_refresh = np.zeros(S, dtype=bool)
    u_stride = max(
        -(-scfg.deepcache_every // max(scfg.uncond_every, 1)), 1
    )  # ceil division
    n_refresh = 0
    for i_exec in range(S):
        step_exec = S - 1 - i_exec
        if refresh[step_exec]:
            if n_refresh % u_stride == 0:
                udeep_refresh[step_exec] = True
            n_refresh += 1
    bank_refresh = np.zeros(S, dtype=bool)
    for i_exec in range(S):
        if i_exec % max(scfg.bank_every, 1) == 0:
            bank_refresh[S - 1 - i_exec] = True
    # trajectory-scheduled reuse (SampleConfig.reuse_exact_first/_last):
    # exact endpoints, aggressive mid-range — every cache refreshes on the
    # first/last N executed steps
    if scfg.reuse_exact_first > 0 or scfg.reuse_exact_last > 0:
        for i_exec in range(S):
            if (i_exec < scfg.reuse_exact_first
                    or i_exec >= S - scfg.reuse_exact_last):
                step_exec = S - 1 - i_exec
                pose_refresh[step_exec] = True
                deep_refresh[step_exec] = True
                bank_refresh[step_exec] = True
                if active[step_exec]:
                    refresh[step_exec] = True
                    udeep_refresh[step_exec] = True
    return (active, refresh, pose_refresh, deep_refresh, udeep_refresh,
            bank_refresh)


def downsample_bank(bank, factor: int, min_seq: int = 4096):
    """Average-pool each (B, S, C) bank entry ``factor x factor`` over its
    site's (sqrt(S), sqrt(S)) spatial grid (opt-in turbo mode,
    SampleConfig.bank_downsample; ToMe-style KV reduction on the bank-read
    shapes of ref attention.py:301-313).

    Entries with fewer than ``min_seq`` tokens — or whose site is not a
    square grid divisible by ``factor`` — pass through exact. Pooling runs
    in fp32 and casts back to the entry dtype.
    """
    if bank is None or factor <= 1:
        return bank

    def pool(e):
        b, s, c = e.shape
        h = int(round(s ** 0.5))
        if h * h != s or s < min_seq or h % factor:
            return e
        hp = h // factor
        x = e.reshape(b, hp, factor, hp, factor, c).astype(jnp.float32)
        return x.mean(axis=(2, 4)).reshape(b, hp * hp, c).astype(e.dtype)

    return jax.tree.map(pool, bank)


def ddim_step(
    x: jax.Array,
    eps: jax.Array,
    alpha: jax.Array,
    alpha_prev: jax.Array,
    sqrt_one_minus_alpha: jax.Array,
    sigma: jax.Array,
    noise: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One DDIM update x_t -> x_{t-1} (ref ddim.py:633-645). Returns
    (x_prev, pred_x0)."""
    pred_x0 = (x - sqrt_one_minus_alpha * eps) / jnp.sqrt(alpha)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - alpha_prev - sigma**2, 0.0)) * eps
    x_prev = jnp.sqrt(alpha_prev) * pred_x0 + dir_xt + sigma * noise
    return x_prev, pred_x0


def ddim_sample(
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
    num_frames: int = 1,
) -> jax.Array:
    """Sample latents x_0 given x_T.

    model: a MagicPoseModel (nn.Module); params: its variables pytree.
    x_T: (B, h, w, 4); context/uncond_context: (1 or B, 77, 768);
    reference_latent: (Br, h, w, 4) with Br ∈ {1, B}; pose_hint: (B, H, W, 3);
    image_hint: (B, H, W, 3) second-ControlNet hint (DUAL_CONTROL variant,
    ref cldm.py:42-52) — residuals sum with the pose branch's, and the turbo
    pose_every cache holds the summed tuple so reuse keeps both branches.
    """
    B = x_T.shape[0]
    S = ddim.num_steps
    use_cfg = scfg.cfg_scale != 1.0 and uncond_context is not None
    # opt-in turbo CFG (SampleConfig.cfg_interval / uncond_every): the
    # default path below stays byte-identical to the reference recipe
    has_controls = (pose_hint is not None and model.cfg.has_pose) or (
        image_hint is not None and model.cfg.has_image_control)
    use_pose_reuse = scfg.pose_every > 1 and has_controls
    use_deepcache = scfg.deepcache_every > 1
    has_appearance = reference_latent is not None and model.cfg.has_appearance
    use_bank_reuse = scfg.bank_every > 1 and has_appearance
    turbo = (
        not scfg.fused_cfg
        and (use_pose_reuse
             or use_deepcache
             or use_bank_reuse
             or (use_cfg and (scfg.cfg_interval is not None
                              or scfg.uncond_every > 1)))
    )

    def tile_ctx(c):
        if c is None:
            return None
        return jnp.broadcast_to(c, (B,) + c.shape[1:]) if c.shape[0] == 1 else c

    ctx = tile_ctx(context)
    uctx = tile_ctx(uncond_context)

    # opt-in self-KV token reduction (ToMe-style static pooling) on the main
    # UNet's read/plain passes; the appearance write pass stays exact
    if scfg.self_kv_downsample > 1:
        assert not scfg.fused_cfg, (
            "self_kv_downsample needs separate cond/uncond passes "
            "(the gated bank_mask kernel has no pooled variant)")
        kv_kw = dict(self_kv_pool=scfg.self_kv_downsample,
                     self_kv_min_seq=scfg.self_kv_min_seq)
    else:
        kv_kw = {}

    ref_ctx = context[:1] if context is not None else None

    def to_eps(model_out, x, t):
        if parameterization is Parameterization.V:
            return predict_eps_from_v(sched, x, t, model_out)
        return model_out

    def body(carry, i):
        x, step_rng = carry
        step = S - 1 - i  # scan descends t
        t_scalar = ddim.timesteps[step]
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        step_rng, rng_ref, rng_sig = jax.random.split(step_rng, 3)

        bank = None
        if has_appearance:
            if scfg.wonoise:
                ref_noisy = reference_latent
            else:
                ref_noise = jax.random.normal(
                    rng_ref, reference_latent.shape, dtype=reference_latent.dtype
                )
                t_ref = jnp.full((reference_latent.shape[0],), t_scalar, jnp.int32)
                ref_noisy = q_sample(sched, reference_latent, t_ref, ref_noise)
            bank = downsample_bank(
                model.apply(
                    params,
                    ref_noisy,
                    jnp.full((reference_latent.shape[0],), t_scalar, jnp.int32),
                    ref_ctx,
                    method=model.compute_bank,
                ),
                scfg.bank_downsample, scfg.bank_downsample_min_seq,
            )

        if use_cfg and scfg.fused_cfg:
            eps_c, eps_u = model.apply(
                params, x, t, ctx, uctx,
                bank=bank, pose_hint=pose_hint, image_hint=image_hint,
                num_frames=num_frames,
                method=model.cfg_fused_eps,
            )
            eps_c = to_eps(eps_c, x, t)
            eps_u = to_eps(eps_u, x, t)
            eps = eps_u + scfg.cfg_scale * (eps_c - eps_u)
        else:
            eps_c = model.apply(
                params, x, t, ctx,
                bank=bank, pose_hint=pose_hint, image_hint=image_hint,
                num_frames=num_frames, **kv_kw,
            )
            eps_c = to_eps(eps_c, x, t)
            if use_cfg:
                if scfg.control_mode == "balance":
                    # "balance": the uncond pass keeps BOTH control branches
                    # and only swaps the text conditioning (the reference's
                    # joint-batch mode, ddim.py:540-567); CFG then steers text
                    # alone, not the controls
                    eps_u = model.apply(
                        params, x, t, uctx,
                        bank=bank, pose_hint=pose_hint, image_hint=image_hint,
                        num_frames=num_frames, **kv_kw,
                    )
                else:  # "controlnet_important": vanilla SD uncond
                    eps_u = model.apply(params, x, t, uctx, uc=True,
                                        num_frames=num_frames, **kv_kw)
                eps_u = to_eps(eps_u, x, t)
                eps = eps_u + scfg.cfg_scale * (eps_c - eps_u)
            else:
                eps = eps_c

        noise = (
            jax.random.normal(rng_sig, x.shape, dtype=x.dtype)
            if scfg.eta > 0
            else jnp.zeros_like(x)
        )
        x_prev, _ = ddim_step(
            x, eps,
            ddim.alphas[step], ddim.alphas_prev[step],
            ddim.sqrt_one_minus_alphas[step], ddim.sigmas[step],
            noise,
        )
        return (x_prev, step_rng), None

    if not turbo:
        (x0, _), _ = jax.lax.scan(body, (x_T, rng), jnp.arange(S))
        return x0

    # ---- turbo CFG scan ---------------------------------------------------
    # Per-step masks are computed on the HOST (static schedule arrays), so
    # the compiled program gates the uncond forward with lax.cond — the
    # skipped branch costs nothing at runtime on TPU.
    (active_np, refresh_np, pose_refresh_np, deep_refresh_np,
     udeep_refresh_np, bank_refresh_np) = build_turbo_schedules(
        scfg, sched.num_timesteps, ddim.timesteps, use_cfg)
    active_arr = jnp.asarray(active_np)
    refresh_arr = jnp.asarray(refresh_np)
    pose_refresh_arr = jnp.asarray(pose_refresh_np)
    deep_refresh_arr = jnp.asarray(deep_refresh_np)
    bank_refresh_arr = jnp.asarray(bank_refresh_np)
    # uncond DeepCache (vanilla-SD pass gets its own deep cache): full passes
    # scheduled over refresh-step ordinals so the first fresh-uncond step
    # always populates the cache — see build_turbo_schedules.
    use_uncond_deepcache = (
        use_deepcache and use_cfg and scfg.control_mode != "balance"
    )
    udeep_refresh_arr = jnp.asarray(udeep_refresh_np)

    if use_pose_reuse:
        pose_shapes = jax.eval_shape(
            lambda: model.apply(
                params, x_T, pose_hint, jnp.zeros((B,), jnp.int32), ctx,
                image_hint=image_hint,
                method=model.compute_control_residuals,
            )
        )
        pose0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             pose_shapes)
    else:
        pose0 = ()

    if use_deepcache:
        deep_shape = jax.eval_shape(
            lambda: model.apply(
                params, x_T, jnp.zeros((B,), jnp.int32), ctx,
                collect_deep=True, deep_level=scfg.deepcache_level,
            )
        )[1]
        deep0 = jnp.zeros(deep_shape.shape, deep_shape.dtype)
    else:
        deep0 = ()
    deep_u0 = deep0 if use_uncond_deepcache else ()

    if use_bank_reuse:
        bank_shapes = jax.eval_shape(
            lambda: downsample_bank(
                model.apply(
                    params, reference_latent,
                    jnp.zeros((reference_latent.shape[0],), jnp.int32),
                    ref_ctx,
                    method=model.compute_bank,
                ),
                scfg.bank_downsample, scfg.bank_downsample_min_seq,
            )
        )
        bank0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             bank_shapes)
    else:
        bank0 = ()

    def body_turbo(carry, i):
        (x, step_rng, eps_u_prev, pose_prev, deep_prev, deep_u_prev,
         bank_prev) = carry
        step = S - 1 - i
        t_scalar = ddim.timesteps[step]
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        step_rng, rng_ref, rng_sig = jax.random.split(step_rng, 3)

        bank = None
        if has_appearance:
            def fresh_bank(_):
                if scfg.wonoise:
                    ref_noisy = reference_latent
                else:
                    ref_noise = jax.random.normal(
                        rng_ref, reference_latent.shape,
                        dtype=reference_latent.dtype,
                    )
                    t_ref = jnp.full((reference_latent.shape[0],), t_scalar,
                                     jnp.int32)
                    ref_noisy = q_sample(sched, reference_latent, t_ref,
                                         ref_noise)
                return downsample_bank(
                    model.apply(
                        params,
                        ref_noisy,
                        jnp.full((reference_latent.shape[0],), t_scalar,
                                 jnp.int32),
                        ref_ctx,
                        method=model.compute_bank,
                    ),
                    scfg.bank_downsample, scfg.bank_downsample_min_seq,
                )

            if use_bank_reuse:
                bank = jax.lax.cond(
                    bank_refresh_arr[step], fresh_bank,
                    lambda _: bank_prev, None,
                )
            else:
                bank = fresh_bank(None)

        if use_pose_reuse:
            def fresh_pose(_):
                return model.apply(
                    params, x, pose_hint, t, ctx, image_hint=image_hint,
                    method=model.compute_control_residuals, **kv_kw,
                )

            pose_res = jax.lax.cond(
                pose_refresh_arr[step], fresh_pose, lambda _: pose_prev, None
            )
        else:
            pose_res = pose_prev  # ()

        pose_kw = dict(pose_residuals=pose_res) if use_pose_reuse else {}
        if use_deepcache:
            def fresh_cond(_):
                e, d = model.apply(
                    params, x, t, ctx,
                    bank=bank, pose_hint=pose_hint, image_hint=image_hint,
                    num_frames=num_frames,
                    collect_deep=True, deep_level=scfg.deepcache_level,
                    **pose_kw, **kv_kw,
                )
                return e, d

            def reuse_cond(_):
                e = model.apply(
                    params, x, t, ctx,
                    bank=bank, pose_hint=pose_hint, image_hint=image_hint,
                    num_frames=num_frames,
                    deep_cache_in=deep_prev, deep_level=scfg.deepcache_level,
                    **pose_kw, **kv_kw,
                )
                return e, deep_prev

            eps_c_raw, deep = jax.lax.cond(
                deep_refresh_arr[step], fresh_cond, reuse_cond, None
            )
            eps_c = to_eps(eps_c_raw, x, t)
        else:
            deep = deep_prev  # ()
            eps_c = to_eps(
                model.apply(
                    params, x, t, ctx,
                    bank=bank, pose_hint=pose_hint, image_hint=image_hint,
                    num_frames=num_frames,
                    **pose_kw, **kv_kw,
                ),
                x, t,
            )

        if use_cfg:
            def fresh_uncond(_):
                if scfg.control_mode == "balance":
                    eu = model.apply(
                        params, x, t, uctx,
                        bank=bank, pose_hint=pose_hint, image_hint=image_hint,
                        num_frames=num_frames,
                        **pose_kw, **kv_kw,
                    )
                    return to_eps(eu, x, t), deep_u_prev
                if use_uncond_deepcache:
                    def u_full(_):
                        e, d = model.apply(params, x, t, uctx, uc=True,
                                           num_frames=num_frames,
                                           collect_deep=True,
                                           deep_level=scfg.deepcache_level,
                                           **kv_kw)
                        return e, d

                    def u_shallow(_):
                        e = model.apply(params, x, t, uctx, uc=True,
                                        num_frames=num_frames,
                                        deep_cache_in=deep_u_prev,
                                        deep_level=scfg.deepcache_level,
                                        **kv_kw)
                        return e, deep_u_prev

                    eu, du = jax.lax.cond(udeep_refresh_arr[step], u_full,
                                          u_shallow, None)
                    return to_eps(eu, x, t), du
                eu = model.apply(params, x, t, uctx, uc=True,
                                 num_frames=num_frames, **kv_kw)
                return to_eps(eu, x, t), deep_u_prev

            eps_u, deep_u = jax.lax.cond(
                refresh_arr[step], fresh_uncond,
                lambda _: (eps_u_prev, deep_u_prev), None
            )
            eps = jnp.where(
                active_arr[step],
                eps_u + scfg.cfg_scale * (eps_c - eps_u),
                eps_c,
            )
        else:
            eps_u = eps_u_prev
            deep_u = deep_u_prev
            eps = eps_c

        noise = (
            jax.random.normal(rng_sig, x.shape, dtype=x.dtype)
            if scfg.eta > 0
            else jnp.zeros_like(x)
        )
        x_prev, _ = ddim_step(
            x, eps,
            ddim.alphas[step], ddim.alphas_prev[step],
            ddim.sqrt_one_minus_alphas[step], ddim.sigmas[step],
            noise,
        )
        bank_carry = bank if use_bank_reuse else ()
        return (x_prev, step_rng, eps_u, pose_res, deep, deep_u,
                bank_carry), None

    carry0 = (x_T, rng, jnp.zeros_like(x_T), pose0, deep0, deep_u0, bank0)
    (x0, *_), _ = jax.lax.scan(body_turbo, carry0, jnp.arange(S))
    return x0
