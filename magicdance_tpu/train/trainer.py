"""SPMD training loop: pure train_step under pjit, ZeRO-1 state sharding.

Replaces the reference's 1,436-line monolithic trainer
(ref: train_tiktok.py — DDP at :1002-1009, ZeroRedundancyOptimizer at
:971-976, AMP/GradScaler at :977,1212-1243, freeze regimes at :762-969,
LambdaLinearScheduler at :991-994, step loop at :1155-1295) with a factored,
functional design:

  * the train step is a pure function (state, batch, rng) → (state, metrics)
    jitted once over a Mesh; gradient all-reduce is XLA's psum over ICI —
    there is no DDP wrapper or bucket tuning to do.
  * parameter freezing is a partition of the param pytree: gradients are
    taken ONLY w.r.t. the trainable subset, so frozen branches never pay the
    dW matmuls (the reference pays them and discards, requires_grad=False
    only skips optimizer updates for DDP'd used params).
  * ZeRO-1: optimizer moments (and grad-accum buffers / EMA) are sharded
    along the data axis via `zero1_sharding`; XLA inserts the gather at the
    update — the analog of ZeroRedundancyOptimizer+consolidate.
  * bf16 compute / f32 params & grads; no GradScaler needed (bf16 range).
  * grad accumulation via optax.MultiSteps; grad clip by global norm 0.5
    (ref train_tiktok.py:1230-1243); linear-warmup-then-constant LR
    (ref utils/lr_scheduler.py:81 LambdaLinearScheduler with cycle 1e13).
  * EMA params via a post-update pytree lerp (ref utils/checkpoint.py EMA
    suffix files; ldm/modules/ema.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax import traverse_util

from magicdance_tpu.config import FreezeRegime, TrainConfig
from magicdance_tpu.models.diffusion import diffusion_loss
from magicdance_tpu.models.vae import encode_to_latent
from magicdance_tpu.ops.schedules import DiffusionSchedule, make_schedule
from magicdance_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_like,
    zero1_sharding,
)


# ---------------------------------------------------------------------------
# freeze regimes as path predicates
# ---------------------------------------------------------------------------

def trainable_predicate(
    regime: FreezeRegime, sd_locked: bool = True
) -> Callable[[tuple[str, ...]], bool]:
    """Predicate over flattened param paths (('unet','enc_attn_0',...)).

    Path roots: 'unet', 'appearance_unet', 'pose_control' (see
    MagicPoseModel.setup). Semantics per reference flag map in
    config.FreezeRegime.
    """

    def in_unet_decoder(path):
        return path[0] == "unet" and (
            path[1].startswith(("dec_", "norm_out", "conv_out"))
        )

    def pred(path: tuple[str, ...]) -> bool:
        root = path[0]
        unlocked = (not sd_locked) and in_unet_decoder(path)
        if regime is FreezeRegime.ALL_TRAINABLE:
            return True
        if regime is FreezeRegime.APPEARANCE_PRETRAIN:
            is_self_attn = root == "unet" and any(p == "attn1" for p in path)
            return (
                root in ("appearance_unet", "pose_control")
                or is_self_attn
                or unlocked
            )
        if regime is FreezeRegime.FINETUNE_CONTROL:
            return root in ("appearance_unet", "pose_control") or unlocked
        if regime is FreezeRegime.POSE_ONLY:
            return root == "pose_control" or unlocked
        if regime is FreezeRegime.REFERENCE_ONLY:
            return root == "appearance_unet" or unlocked
        if regime is FreezeRegime.MOTION_ONLY:
            return any("motion" in p for p in path)
        raise ValueError(regime)

    return pred


def partition_params(params: Any, pred: Callable[[tuple[str, ...]], bool]):
    """Split a params dict into (trainable, frozen) flat-key dicts."""
    flat = traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items() if pred(k)}
    frozen = {k: v for k, v in flat.items() if not pred(k)}
    return train, frozen


def merge_params(train: dict, frozen: dict) -> Any:
    return traverse_util.unflatten_dict({**train, **frozen})


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------

def make_lr_schedule(ocfg) -> optax.Schedule:
    """Linear warmup 0→lr then constant — LambdaLinearScheduler with the
    reference's cycle length 1e13 is constant-after-warmup in practice
    (ref train_tiktok.py:991-994, utils/lr_scheduler.py:81)."""
    warm = optax.linear_schedule(0.0, ocfg.learning_rate, max(1, ocfg.warmup_steps))
    return optax.join_schedules(
        [warm, optax.constant_schedule(ocfg.learning_rate)],
        [max(1, ocfg.warmup_steps)],
    )


def make_optimizer(ocfg) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(ocfg.grad_clip),
        optax.adamw(
            make_lr_schedule(ocfg),
            b1=ocfg.adam_b1,
            b2=ocfg.adam_b2,
            eps=ocfg.adam_eps,
            weight_decay=ocfg.weight_decay,
        ),
    )
    if ocfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=ocfg.grad_accum)
    return tx


class TrainState(struct.PyTreeNode):
    step: jax.Array
    train_params: Any
    frozen_params: Any  # frozen denoiser params + vae + clip
    opt_state: Any
    ema_params: Optional[Any] = None


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Owns the mesh, the jitted train step, and state creation.

    models: dict with keys 'model' (MagicPoseModel), 'vae' (AutoencoderKL),
    'clip' (CLIPTextEncoder) — VAE/CLIP are frozen feature extractors applied
    inside the step (ref train_tiktok.py:1187-1197 encodes under no_grad).
    """

    def __init__(self, cfg: TrainConfig, model, vae, clip, mesh=None):
        self.cfg = cfg
        self.model = model
        self.vae = vae
        self.clip = clip
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_axes)
        self.sched: DiffusionSchedule = make_schedule(cfg.model.diffusion)
        self.tx = make_optimizer(cfg.optim)
        self.pred = trainable_predicate(cfg.freeze, cfg.sd_locked)
        # video clips arrive frame-folded into batch: (B*F, H, W, C)
        # (ref train_tiktok.py:1189-1200; video_length 16, motion_module.py:137)
        self.num_frames = cfg.video_frames if cfg.model.has_temporal else 1
        self._jit_step = None

    # -- state ------------------------------------------------------------
    def create_state(
        self, model_params: Any, vae_params: Any, clip_params: Any
    ) -> TrainState:
        train, frozen_model = partition_params(model_params["params"], self.pred)
        frozen = {
            "model": frozen_model,
            "vae": vae_params["params"],
            "clip": clip_params["params"],
        }
        if self.cfg.optim.frozen_dtype == "bfloat16":
            frozen = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p,
                frozen,
            )
        elif self.cfg.optim.frozen_dtype == "int8":
            # weight-only int8 STORAGE (train/quant.py): halves the frozen
            # weight stream; compute still dequantizes to bf16
            from magicdance_tpu.train.quant import quantize_tree

            frozen = quantize_tree(frozen)
        opt_state = self.tx.init(train)
        ema = jax.tree.map(jnp.copy, train) if self.cfg.optim.ema_rate > 0 else None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            train_params=train,
            frozen_params=frozen,
            opt_state=opt_state,
            ema_params=ema,
        )

    def state_shardings(self, state: TrainState) -> TrainState:
        """ZeRO-1 layout: params replicated, optimizer moments + EMA sharded
        along 'data'."""
        return TrainState(
            step=replicated_like(state.step, self.mesh),
            train_params=replicated_like(state.train_params, self.mesh),
            frozen_params=replicated_like(state.frozen_params, self.mesh),
            opt_state=(
                zero1_sharding(state.opt_state, self.mesh)
                if self.cfg.optim.shard_opt_state
                else replicated_like(state.opt_state, self.mesh)
            ),
            ema_params=(
                zero1_sharding(state.ema_params, self.mesh)
                if state.ema_params is not None
                else None
            ),
        )

    # -- step -------------------------------------------------------------
    def _loss(self, train_params, frozen_params, batch, rng):
        cfg = self.cfg
        if cfg.optim.frozen_dtype == "int8":
            from magicdance_tpu.train.quant import dequantize_tree

            frozen_params = dequantize_tree(frozen_params)
        model_params = {"params": merge_params(train_params, frozen_params["model"])}
        vae_params = {"params": frozen_params["vae"]}
        clip_params = {"params": frozen_params["clip"]}

        rng_vae, rng_ref, rng_loss = jax.random.split(rng, 3)

        # frozen feature extractors — no grads flow through them
        from magicdance_tpu.ops.attention import attention_impl

        def vae_encode(imgs, rng):
            """Frozen-VAE encode, chunked over the (frame-folded) batch so
            the full-res f32 encoder activations never exceed chunk-size
            batches (cfg.vae_encode_chunk; the 512²/F=16 HBM fix)."""
            chunk = cfg.vae_encode_chunk
            n = imgs.shape[0]
            if chunk and n > chunk and n % chunk == 0:
                rngs = jax.random.split(rng, n // chunk)

                def enc(args):
                    im, r = args
                    post = self.vae.apply(vae_params, im,
                                          method=self.vae.encode)
                    return post.sample(r)

                z = jax.lax.map(
                    enc, (imgs.reshape(n // chunk, chunk, *imgs.shape[1:]),
                          rngs))
                z = z.reshape(n, *z.shape[2:])
            else:
                z = self.vae.apply(vae_params, imgs,
                                   method=self.vae.encode).sample(rng)
            return encode_to_latent(z, cfg.model.vae.scale_factor)

        with attention_impl("auto"):
            x0 = vae_encode(batch["image"], rng_vae)

            ref_latent = None
            if cfg.model.has_appearance:
                ref_latent = vae_encode(batch["reference"], rng_ref)

            context = self.clip.apply(clip_params, batch["input_ids"])
        x0 = jax.lax.stop_gradient(x0)
        if ref_latent is not None:
            ref_latent = jax.lax.stop_gradient(ref_latent)
        context = jax.lax.stop_gradient(context)

        pose_hint = batch.get("pose") if cfg.model.has_pose else None
        num_frames = self.num_frames

        def apply_fn(x_noisy, t, ctx, **kw):
            return self.model.apply(model_params, x_noisy, t, ctx,
                                    deterministic=False, **kw)

        return diffusion_loss(
            apply_fn, self.sched, cfg.model.diffusion, rng_loss, x0, context,
            reference_latent=ref_latent, pose_hint=pose_hint,
            wonoise=True, num_frames=num_frames,
        )

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array):
        from magicdance_tpu.ops.attention import attention_impl

        # "auto" trains through the Pallas flash kernels (fwd + custom-VJP
        # bwd, ops/pallas/flash_vjp.py) — no S×S logits in HBM in either
        # direction, the thing that previously compile-OOM'd 512² stage-3
        with attention_impl(self.cfg.attention_impl):
            (loss, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
                state.train_params, state.frozen_params, batch, rng
            )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.train_params)
        new_train = optax.apply_updates(state.train_params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)

        new_ema = state.ema_params
        if new_ema is not None:
            rate = self.cfg.optim.ema_rate
            new_ema = jax.tree.map(
                lambda e, p: e * rate + p * (1.0 - rate), new_ema, new_train
            )
        new_state = state.replace(
            step=state.step + 1,
            train_params=new_train,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    def jitted_step(self, state: TrainState, batch: dict):
        """Build the pjit'd step with batch sharded over 'data' and ZeRO-1
        state shardings (compiled once, reused every step)."""
        if self._jit_step is None:
            from magicdance_tpu.parallel.mesh import replicated

            shardings = self.state_shardings(state)
            batch_sh = {
                k: batch_sharding(self.mesh, ndim=v.ndim) for k, v in batch.items()
            }
            self._jit_step = jax.jit(
                self.train_step,
                in_shardings=(shardings, batch_sh, replicated(self.mesh)),
                out_shardings=(shardings, replicated(self.mesh)),
                donate_argnums=(0,),
            )
        return self._jit_step
