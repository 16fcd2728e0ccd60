"""MagicPose composed model: main UNet + appearance branch + pose ControlNet.

TPU-native equivalent of the ControlLDM* heads
(ref: cldm/cldm.py:1055 ControlLDMReferenceOnly, :1087
ControlLDMReferenceOnlyPose, :760 ControlLDM) and their `apply_model`
dispatch (cldm.py:1099-1117):

  * appearance branch (ControlNetReferenceOnly, cldm.py:164-497): a full UNet
    copy run on the (optionally noised) reference latent in bank-write mode;
    here it is simply a second `UNet` whose bank output pytree is passed to
    the main UNet — no mutable side-channel, no attn_index walk.
  * pose branch (ControlNet, cldm.py:500-757): returns the 13 zero-conv
    residuals.
  * CFG uncond pass (`uc=True`): vanilla SD forward, both branches skipped
    entirely. The reference *computes* the pose branch in the uncond pass and
    then discards it (cldm.py:1112-1114 vs 71-84) — we skip the wasted work;
    outputs are identical.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from magicdance_tpu.config import ModelConfig, UNetConfig
from magicdance_tpu.models.controlnet import PoseControlNet
from magicdance_tpu.models.unet import Bank, UNet


def appearance_unet_config(cfg: ModelConfig) -> UNetConfig:
    """The appearance branch shares the UNet architecture but never carries
    motion modules (ref: appearance model is spatial-only even in stage 3)."""
    return UNetConfig(
        in_channels=cfg.unet.in_channels,
        out_channels=cfg.unet.out_channels,
        model_channels=cfg.unet.model_channels,
        channel_mult=cfg.unet.channel_mult,
        num_res_blocks=cfg.unet.num_res_blocks,
        attention_resolutions=cfg.unet.attention_resolutions,
        num_heads=cfg.unet.num_heads,
        transformer_depth=cfg.unet.transformer_depth,
        context_dim=cfg.unet.context_dim,
        dropout=cfg.unet.dropout,
        use_motion_modules=False,
        remat=cfg.unet.remat,
    )


class MagicPoseModel(nn.Module):
    """Denoiser composite. VAE and CLIP live outside (frozen, applied once per
    batch, ref ddpm.py:1895-1907) — this module is exactly the per-step hot
    path."""

    cfg: ModelConfig

    def setup(self):
        self.unet = UNet(self.cfg.unet)
        if self.cfg.has_appearance:
            self.appearance_unet = UNet(appearance_unet_config(self.cfg))
        if self.cfg.has_pose:
            self.pose_control = PoseControlNet(self.cfg.pose_control)
        if self.cfg.has_image_control:
            # second classic ControlNet (image-hint branch); residual lists
            # sum positionally into the UNet (ref cldm.py:42-52, :909)
            self.image_control_model = PoseControlNet(
                self.cfg.image_control or self.cfg.pose_control)

    def compute_bank(
        self,
        reference_noisy: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        deterministic: bool = True,
    ) -> Bank:
        """Run the appearance UNet in write mode (ref cldm.py:469-497). The
        eps output is discarded; only the bank matters."""
        _, bank = self.appearance_unet(
            reference_noisy,
            timesteps,
            context,
            collect_bank=True,
            deterministic=deterministic,
            dtype=self._dtype(),
        )
        return bank

    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def compute_pose_residuals(
        self,
        x_noisy: jax.Array,
        pose_hint: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        deterministic: bool = True,
        self_kv_pool: int = 1,
        self_kv_min_seq: int = 4096,
    ) -> Tuple[jax.Array, ...]:
        """Run only the pose branch (ref cldm.py:736-757). Exposed so the
        sampler's turbo mode can refresh residuals every k-th step and feed
        them back via `pose_residuals=`."""
        return self.pose_control(
            x_noisy, pose_hint, timesteps, context,
            deterministic=deterministic, dtype=self._dtype(),
            self_kv_pool=self_kv_pool, self_kv_min_seq=self_kv_min_seq,
        )

    def compute_control_residuals(
        self,
        x_noisy: jax.Array,
        pose_hint: Optional[jax.Array],
        timesteps: jax.Array,
        context: jax.Array,
        image_hint: Optional[jax.Array] = None,
        deterministic: bool = True,
        self_kv_pool: int = 1,
        self_kv_min_seq: int = 4096,
    ) -> Optional[Tuple[jax.Array, ...]]:
        """All residual-style control branches summed positionally: pose
        ControlNet + (DUAL_CONTROL) image ControlNet (ref cldm.py:42-52
        `hs.pop() + control.pop() + image_control.pop()`). This sum is the
        quantity the turbo mode caches, so residual reuse keeps BOTH
        branches."""
        dtype = self._dtype()
        res = None
        if self.cfg.has_pose and pose_hint is not None:
            res = self.pose_control(
                x_noisy, pose_hint, timesteps, context,
                deterministic=deterministic, dtype=dtype,
                self_kv_pool=self_kv_pool, self_kv_min_seq=self_kv_min_seq,
            )
        if self.cfg.has_image_control and image_hint is not None:
            ir = self.image_control_model(
                x_noisy, image_hint, timesteps, context,
                deterministic=deterministic, dtype=dtype,
                self_kv_pool=self_kv_pool, self_kv_min_seq=self_kv_min_seq,
            )
            res = ir if res is None else tuple(
                a + b for a, b in zip(res, ir))
        return res

    def __call__(
        self,
        x_noisy: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        *,
        reference_noisy: Optional[jax.Array] = None,
        pose_hint: Optional[jax.Array] = None,
        image_hint: Optional[jax.Array] = None,
        bank: Optional[Bank] = None,
        uc: bool = False,
        num_frames: int = 1,
        deterministic: bool = True,
        concat_cond: Optional[jax.Array] = None,
        pose_residuals: Optional[Tuple[jax.Array, ...]] = None,
        collect_deep: bool = False,
        deep_cache_in: Optional[jax.Array] = None,
        deep_level: int = 0,
        self_kv_pool: int = 1,
        self_kv_min_seq: int = 4096,
    ):
        """eps/v prediction (ref cldm.py:1099-1117 apply_model).

        Either pass `reference_noisy` (bank computed inline, training path) or
        a precomputed `bank` (inference path where one reference serves many
        frames/steps). `uc=True` is the CFG uncond vanilla-SD pass.
        `image_hint` (DUAL_CONTROL variant) feeds the second ControlNet whose
        residuals sum with the pose branch's (ref cldm.py:42-52, :909
        ControlLDMVideo).
        `concat_cond` (mask / masked-latent channels) is concatenated onto the
        UNet input for the inpaint/mask variants (ref cldm.py:889
        ControlInpaintLDM, :985 ControlLDMVideoMaskPose; ddim.py:524-527
        per-step c_concat) — cfg.unet.in_channels must account for it.
        `pose_residuals`, if given, bypasses the pose branch (turbo-mode
        residual reuse; see compute_pose_residuals).
        `collect_deep` / `deep_cache_in` thread the DeepCache deep feature
        through the main UNet (turbo-mode deep-level reuse; see
        models/unet.py) — with collect_deep the return is (eps, deep).
        """
        dtype = self._dtype()
        if concat_cond is not None:
            x_noisy = jnp.concatenate(
                [x_noisy, concat_cond.astype(x_noisy.dtype)], axis=-1
            )
        if uc:
            res = self.unet(
                x_noisy, timesteps, context, num_frames=num_frames,
                deterministic=deterministic, dtype=dtype,
                collect_deep=collect_deep, deep_cache_in=deep_cache_in,
                deep_level=deep_level, self_kv_pool=self_kv_pool,
                self_kv_min_seq=self_kv_min_seq,
            )
            if collect_deep:
                out, _, deep = res
                return out, deep
            out, _ = res
            return out

        if bank is not None and len(bank) and bank[0].shape[0] not in (1, x_noisy.shape[0]):
            # temporal training: one reference per clip, frames folded into
            # batch — repeat bank entries per frame (Bb -> B*F)
            rep = x_noisy.shape[0] // bank[0].shape[0]
            bank = tuple(jnp.repeat(e, rep, axis=0) for e in bank)

        if bank is None and self.cfg.has_appearance and reference_noisy is not None:
            # reference branch uses the same timestep trajectory as the main
            # latent (ref ddpm.py:2165-2179); with frames folded into batch,
            # one reference per clip takes its clip's timestep
            t_ref = timesteps
            if reference_noisy.shape[0] != timesteps.shape[0]:
                stride = timesteps.shape[0] // reference_noisy.shape[0]
                t_ref = timesteps[::stride]
            ctx_ref = context
            if context.shape[0] != reference_noisy.shape[0]:
                stride = max(1, context.shape[0] // reference_noisy.shape[0])
                ctx_ref = context[::stride][: reference_noisy.shape[0]]
            bank = self.compute_bank(reference_noisy, t_ref, ctx_ref,
                                     deterministic=deterministic)
            if bank[0].shape[0] not in (1, x_noisy.shape[0]):
                rep = x_noisy.shape[0] // bank[0].shape[0]
                bank = tuple(jnp.repeat(e, rep, axis=0) for e in bank)

        if pose_residuals is None:
            # pose + (DUAL_CONTROL) image branches, summed positionally;
            # a passed-in `pose_residuals` is the already-summed control
            # tuple (the turbo cache), so both branches are reused together
            pose_residuals = self.compute_control_residuals(
                x_noisy, pose_hint, timesteps, context,
                image_hint=image_hint, deterministic=deterministic,
                self_kv_pool=self_kv_pool, self_kv_min_seq=self_kv_min_seq,
            )

        res = self.unet(
            x_noisy, timesteps, context,
            bank=bank, pose_residuals=pose_residuals, num_frames=num_frames,
            deterministic=deterministic, dtype=dtype,
            collect_deep=collect_deep, deep_cache_in=deep_cache_in,
            deep_level=deep_level, self_kv_pool=self_kv_pool,
            self_kv_min_seq=self_kv_min_seq,
        )
        if collect_deep:
            out, _, deep = res
            return out, deep
        out, _ = res
        return out

    def cfg_fused_eps(
        self,
        x_noisy: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        uncond_context: jax.Array,
        *,
        bank: Optional[Bank] = None,
        pose_hint: Optional[jax.Array] = None,
        image_hint: Optional[jax.Array] = None,
        num_frames: int = 1,
    ) -> tuple[jax.Array, jax.Array]:
        """Fused classifier-free guidance: cond and uncond run as ONE batched
        UNet forward (batch 2B). Uncond rows carry bank_mask=0 (exactly plain
        self-attention) and zero pose residuals — numerically identical to
        the reference's two sequential passes in controlnet_important mode
        (ddim.py:603-604) at better MXU utilization and half the dispatches.

        Returns (eps_cond, eps_uncond), each (B, ...).
        """
        dtype = self._dtype()
        B = x_noisy.shape[0]
        xx = jnp.concatenate([x_noisy, x_noisy], axis=0)
        tt = jnp.concatenate([timesteps, timesteps], axis=0)
        cc = jnp.concatenate([
            jnp.broadcast_to(context, (B,) + context.shape[1:]),
            jnp.broadcast_to(uncond_context, (B,) + uncond_context.shape[1:]),
        ], axis=0)
        mask = jnp.concatenate([jnp.ones((B,), jnp.float32),
                                jnp.zeros((B,), jnp.float32)])

        pose_residuals = None
        res = self.compute_control_residuals(
            x_noisy, pose_hint, timesteps, context, image_hint=image_hint)
        if res is not None:
            pose_residuals = tuple(
                jnp.concatenate([r, jnp.zeros_like(r)], axis=0) for r in res
            )

        if bank is not None and self.cfg.has_appearance:
            out, _ = self.unet(
                xx, tt, cc, bank=bank, bank_mask=mask,
                pose_residuals=pose_residuals, num_frames=num_frames,
                dtype=dtype,
            )
        else:
            out, _ = self.unet(xx, tt, cc, pose_residuals=pose_residuals,
                               num_frames=num_frames, dtype=dtype)
        return out[:B], out[B:]
