"""High-level inference pipeline: reference image + pose maps → frames.

The product equivalent of the reference's test_any_image_pose.py /
test_tiktok.py flow (ref: test_any_image_pose.py:139-262): VAE-encode the
reference once, CLIP-encode the (usually empty) prompt once, then denoise a
whole batch of pose frames with the DDIM scan. Frames are batched — the
reference loops Python-per-frame (test_any_image_pose.py:210) — and the
appearance bank is computed once per step for the entire frame batch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from magicdance_tpu.config import ModelConfig, SampleConfig
from magicdance_tpu.data.tokenizer import CLIPTokenizer, empty_prompt_ids
from magicdance_tpu.models import (
    AutoencoderKL,
    CLIPTextEncoder,
    MagicPoseModel,
)
from magicdance_tpu.models.vae import encode_to_latent, latent_to_decoder_input
from magicdance_tpu.ops.schedules import make_ddim_schedule, make_schedule
from magicdance_tpu.sampling.ddim import ddim_sample


class MagicPosePipeline:
    """Bundles the four networks + schedules behind a sampling API."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: Optional[dict] = None,
        tokenizer: Optional[CLIPTokenizer] = None,
    ):
        self.cfg = cfg
        self.model = MagicPoseModel(cfg)
        self.vae = AutoencoderKL(
            cfg.vae,
            dtype=jnp.bfloat16 if cfg.vae.compute_dtype == "bfloat16"
            else jnp.float32,
        )
        self.clip = CLIPTextEncoder(cfg.clip)
        self.sched = make_schedule(cfg.diffusion)
        self.tokenizer = tokenizer or CLIPTokenizer()
        self.params = params  # {"model": .., "vae": .., "clip": ..}
        self._jit_sample = {}
        # standalone jitted encoder/decoder entry points (jax.jit caches per
        # shape): without these each eager `module.apply` dispatches hundreds
        # of single ops — measured 85% device idle through the axon relay
        self._jit_encode_text = jax.jit(
            lambda params, ids: self.clip.apply(params["clip"], ids)
        )
        self._jit_encode_ref = jax.jit(
            lambda params, img: encode_to_latent(
                self.vae.apply(params["vae"], img, method=self.vae.encode).mode(),
                self.cfg.vae.scale_factor,
            )
        )
        self._jit_decode = jax.jit(
            lambda params, lat: self.vae.apply(
                params["vae"],
                latent_to_decoder_input(lat, self.cfg.vae.scale_factor),
                method=self.vae.decode,
            )
        )

    # -- initialization ----------------------------------------------------
    def init_params(self, rng: jax.Array, image_size: int = 512) -> dict:
        """Random init (tests/bench); real runs load converted checkpoints."""
        latent = image_size // 8
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        x = jnp.zeros((1, latent, latent, 4))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, self.cfg.clip.max_length, self.cfg.unet.context_dim))
        kw = {}
        if self.cfg.has_appearance:
            kw["reference_noisy"] = x
        if self.cfg.has_pose:
            kw["pose_hint"] = jnp.zeros((1, image_size, image_size, 3))
        if self.cfg.has_image_control:
            kw["image_hint"] = jnp.zeros((1, image_size, image_size, 3))
        params = {
            "model": self.model.init(r1, x, t, ctx, **kw),
            "vae": self.vae.init(
                r2, jnp.zeros((1, image_size, image_size, 3)), r4
            ),
            "clip": self.clip.init(r3, jnp.zeros((1, self.cfg.clip.max_length),
                                                 jnp.int32)),
        }
        self.params = params
        return params

    def fast_init_params(self, rng: jax.Array, image_size: int = 512,
                         scale: float = 0.02, zeros: bool = False) -> dict:
        """Shape-only init (jax.eval_shape) + random (or zero) leaves, no
        forward execution — for benchmarks/smoke tests at full scale where
        running `init`'s forward pass is wasteful. `zeros=True` creates all
        leaves directly on device (instant; values don't affect throughput
        measurements). Real runs load converted checkpoints."""
        latent = image_size // 8
        x = jax.ShapeDtypeStruct((1, latent, latent, 4), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.int32)
        ctx = jax.ShapeDtypeStruct(
            (1, self.cfg.clip.max_length, self.cfg.unet.context_dim), jnp.float32
        )
        kw = {}
        if self.cfg.has_appearance:
            kw["reference_noisy"] = x
        if self.cfg.has_pose:
            kw["pose_hint"] = jax.ShapeDtypeStruct(
                (1, image_size, image_size, 3), jnp.float32
            )
        if self.cfg.has_image_control:
            kw["image_hint"] = jax.ShapeDtypeStruct(
                (1, image_size, image_size, 3), jnp.float32
            )
        img = jax.ShapeDtypeStruct((1, image_size, image_size, 3), jnp.float32)
        ids = jax.ShapeDtypeStruct((1, self.cfg.clip.max_length), jnp.int32)
        k = jax.random.PRNGKey(0)
        shapes = {
            "model": jax.eval_shape(
                lambda x_, t_, c_, **kw_: self.model.init(k, x_, t_, c_, **kw_),
                x, t, ctx, **kw,
            ),
            "vae": jax.eval_shape(lambda i_: self.vae.init(k, i_, k), img),
            "clip": jax.eval_shape(lambda i_: self.clip.init(k, i_), ids),
        }
        # materialize ALL leaves in ONE compiled program — per-leaf eager
        # creation is thousands of device dispatches (measured ~87 s through
        # the axon relay at SD1.5 scale)
        if zeros:
            self.params = jax.jit(
                lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            )()
            return self.params

        rs = np.random.RandomState(int(jax.random.randint(rng, (), 0, 2**31 - 1)))

        def leaf(s):
            if s.dtype == jnp.float32:
                return rs.standard_normal(s.shape).astype(np.float32) * scale
            return np.zeros(s.shape, s.dtype)

        # host-generate, then ONE device_put of the whole tree (per-leaf
        # jnp.asarray is a dispatch per leaf)
        self.params = jax.device_put(jax.tree.map(leaf, shapes))
        return self.params

    def cast_model_params(self, dtype=jnp.bfloat16) -> None:
        """Cast denoiser params for serving (VAE/CLIP stay f32).

        Donates the f32 tree so its HBM is released as the cast runs —
        without donation startup transiently holds both the f32 and bf16
        copies of the denoiser. NOTE: donation DELETES the input buffers;
        any alias of ``pipe.params["model"]`` taken before this call
        becomes invalid ("Array has been deleted"). Take references after
        casting, or keep your own copy."""
        self.params["model"] = jax.jit(
            lambda t: jax.tree.map(
                lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, t
            ),
            donate_argnums=0,
        )(self.params["model"])

    # -- encoders ----------------------------------------------------------
    def encode_text(self, prompts: list[str]) -> jax.Array:
        ids = jnp.asarray(self.tokenizer(prompts, self.cfg.clip.max_length))
        return self._jit_encode_text(self.params, ids)

    def encode_empty(self, batch: int = 1) -> jax.Array:
        ids = jnp.asarray(empty_prompt_ids(batch, self.cfg.clip.max_length))
        return self._jit_encode_text(self.params, ids)

    def encode_reference(self, image: jax.Array, rng=None) -> jax.Array:
        """image: (1, H, W, 3) in [-1, 1] → scaled latent (1, H/8, W/8, 4).
        Uses the posterior mode (deterministic, eval semantics)."""
        if rng is None:
            return self._jit_encode_ref(self.params, image)
        post = self.vae.apply(self.params["vae"], image, method=self.vae.encode)
        return encode_to_latent(post.sample(rng), self.cfg.vae.scale_factor)

    def decode_latents(self, latents: jax.Array) -> jax.Array:
        return self._jit_decode(self.params, latents)

    # -- sampling ----------------------------------------------------------
    def sample_frames(
        self,
        rng: jax.Array,
        pose_maps: Optional[jax.Array],
        reference_image: Optional[jax.Array],
        scfg: SampleConfig = SampleConfig(),
        prompts: Optional[list[str]] = None,
        decode: bool = True,
        video: bool = False,
        image_hints: "Optional[jax.Array]" = None,
        mesh: "Optional[jax.sharding.Mesh]" = None,
    ) -> jax.Array:
        """pose_maps: (F, H, W, 3) in [0,1] or None; reference_image:
        (1, H, W, 3) in [-1,1] or None; image_hints: (F, H, W, 3) in [0,1]
        second-ControlNet hints (DUAL_CONTROL variant) or None. Returns
        (F, H, W, 3) images in [-1, 1] (or latents if decode=False).

        Shared x_T across frames per the reference recipe
        (test_any_image_pose.py:201-202) when scfg.shared_noise.
        `video=True` (temporal model variants) routes through overlap
        sampling: motion-module windows of scfg.window frames, stride
        scfg.stride.

        mesh: optional 1-axis ``jax.sharding.Mesh`` (axis name "data") —
        multi-chip frame-parallel serving. The image path shards x_T /
        pose maps / decode over frames; the video path shards the overlap
        windows per step (see ddim_sample_video.window_sharding). Weights
        are replicated; outputs are exact vs the single-device run.
        """
        cfg = self.cfg
        if pose_maps is not None:
            F, H = pose_maps.shape[0], pose_maps.shape[1]
        else:
            F, H = 1, cfg.latent_size * 8
        latent = H // 8

        # host side: tokenize only; everything else (CLIP, VAE reference
        # encode, noise draw, the DDIM scan, decode) is ONE compiled program —
        # a single device dispatch per sample call
        ids = jnp.asarray(
            self.tokenizer(prompts, self.cfg.clip.max_length) if prompts
            else empty_prompt_ids(1, self.cfg.clip.max_length)
        )
        uncond_ids = jnp.asarray(empty_prompt_ids(1, self.cfg.clip.max_length))

        use_ref = reference_image is not None and cfg.has_appearance
        ddim = make_ddim_schedule(self.sched, scfg.steps, eta=scfg.eta)
        video = video and cfg.has_temporal
        decode_chunk = 8
        # memo key = EVERY SampleConfig field + the shape/presence statics.
        # Derived from the whole dataclass so a new sampling flag can never
        # silently alias an already-compiled program (round-4 bug: the
        # hand-maintained field list missed self_kv_downsample and the
        # "new" variant reused the exact program).
        import dataclasses

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            frames_sharding = NamedSharding(mesh, PartitionSpec("data"))
        else:
            frames_sharding = None

        key = (dataclasses.astuple(scfg), F, latent, pose_maps is not None,
               use_ref, decode, video, image_hints is not None,
               frames_sharding)
        if key not in self._jit_sample:
            def run(params, ids, uids, ref_image, pose_maps, image_hints,
                    rng):
                ctx = self.clip.apply(params["clip"], ids).astype(jnp.float32)
                uctx = self.clip.apply(params["clip"], uids).astype(jnp.float32)
                ref_latent = None
                if use_ref:
                    post = self.vae.apply(
                        params["vae"], ref_image, method=self.vae.encode
                    )
                    ref_latent = encode_to_latent(
                        post.mode(), cfg.vae.scale_factor
                    )
                rng_noise, rng = jax.random.split(rng)
                if scfg.shared_noise:
                    x_T = jnp.broadcast_to(
                        jax.random.normal(rng_noise, (1, latent, latent, 4)),
                        (F, latent, latent, 4),
                    )
                else:
                    x_T = jax.random.normal(rng_noise, (F, latent, latent, 4))
                if frames_sharding is not None and not video:
                    # image path: frames are the batch axis end to end
                    x_T = jax.lax.with_sharding_constraint(x_T, frames_sharding)
                    if pose_maps is not None:
                        pose_maps = jax.lax.with_sharding_constraint(
                            pose_maps, frames_sharding)
                if video:
                    from magicdance_tpu.sampling.overlap import ddim_sample_video

                    lat = ddim_sample_video(
                        self.model, params["model"], self.sched, ddim, scfg,
                        rng, x_T, ctx, uctx,
                        reference_latent=ref_latent, pose_hint=pose_maps,
                        image_hint=image_hints,
                        parameterization=cfg.diffusion.parameterization,
                        window_sharding=frames_sharding,
                    )
                else:
                    lat = ddim_sample(
                        self.model, params["model"], self.sched, ddim, scfg,
                        rng, x_T, ctx, uctx,
                        reference_latent=ref_latent, pose_hint=pose_maps,
                        image_hint=image_hints,
                        parameterization=cfg.diffusion.parameterization,
                    )
                if decode:
                    z = latent_to_decoder_input(lat, cfg.vae.scale_factor)
                    # decode in fixed-size chunks: a full-batch 512^2 decode
                    # dominates HBM (hundreds of MB of activations per frame)
                    # and caps the denoising batch size otherwise
                    ck = decode_chunk
                    if z.shape[0] % ck == 0 and z.shape[0] > ck:
                        zc = z.reshape((z.shape[0] // ck, ck) + z.shape[1:])
                        imgs = jax.lax.map(
                            lambda zz: self.vae.apply(
                                params["vae"], zz, method=self.vae.decode),
                            zc,
                        )
                        return imgs.reshape((-1,) + imgs.shape[2:])
                    return self.vae.apply(params["vae"], z,
                                          method=self.vae.decode)
                return lat

            self._jit_sample[key] = jax.jit(run)
        return self._jit_sample[key](
            self.params, ids, uncond_ids,
            reference_image if use_ref else None, pose_maps, image_hints,
            rng,
        )
