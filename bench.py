"""Benchmark: denoised 512x512 frames/sec/chip at DDIM-50 (BASELINE.json).

Full MagicPose serving path on one TPU chip: per DDIM step one appearance
bank write (shared by the frame batch), per frame a pose-ControlNet forward,
a bank-read cond UNet forward, and a plain uncond UNet forward
(controlnet_important CFG, ref ddim.py:598-605), finished with VAE decode.

Prints ONE JSON line. The headline `value` is EXACT reference parity; the
`detail` dict also carries the measured turbo-stack fps (opt-in approximate
modes) and, when BENCH_VIDEO=1, the temporal-UNet overlap-sampling video
fps, so the round artifact records the full envelope. vs_baseline is
against the driver-set target of 8 frames/sec/chip (BASELINE.md "Rebuild
targets").

Env knobs: BENCH_FRAMES (32), BENCH_STEPS (50), BENCH_SIZE (512),
BENCH_TURBO=0 to skip the turbo row, BENCH_VIDEO=0 to skip the video row.

Leg order is exact -> video -> turbo: the video row is the one capability
the reference never shipped runnable, so if the time budget fires it must
be the turbo row (re-derivable from BENCH.md) that drops, never video.
Whenever an optional leg is skipped, detail carries an explicit
``*_skipped`` reason so a missing number is distinguishable from a
never-wired one (round-3 verdict item).

Cold-compile note (round-4 diagnosis): the persistent cache DOES work
through the axon relay (same program: 731.9s cold vs 59.3s warm, and the
key ignores source-line metadata). The round-3 731.9s was a stale prewarm:
the last builder bench run predated the final committed code, so the
driver's HLO missed. Protocol: after the final code-affecting commit of a
round, re-run `python bench.py` once so the driver's run hits the cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


FRAMES = int(os.environ.get("BENCH_FRAMES", "32"))
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
RUN_TURBO = os.environ.get("BENCH_TURBO", "1") == "1"
RUN_VIDEO = os.environ.get("BENCH_VIDEO", "1") == "1"
# turbo_max: the best quality-bounded serving config (DDIM-20 + the full
# reuse/pooling stack) — the row that answers "how close to the 8 f/s
# target can this chip actually get" (VERDICT r4 item 2). Measured
# 2026-08-20: 8.18 f/s = 102 % of the target (scripts/bench_turbo6.py).
RUN_TURBO_MAX = os.environ.get("BENCH_TURBO_MAX", "1") == "1"
TURBO_MAX_STEPS = int(os.environ.get("BENCH_TURBO_MAX_STEPS", "20"))
# PSNR guardrail for turbo_max vs the same-steps exact trajectory (random
# weights, B=8): the stack must stay >= 65 dB or the row is reported as
# failing its guardrail
RUN_QUALITY = os.environ.get("BENCH_QUALITY", "1") == "1"
# skip optional rows if the run is already this old (cold-cache safety so
# the driver's budget is never blown by the non-headline rows)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
TARGET_FPS = 8.0
_T_START = time.time()

# persistent compilation cache: repeat bench runs (and the driver's
# end-of-round run after this round prewarmed the TPU entries) skip the
# multi-minute sampler compile entirely
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".cache", "xla")
try:
    os.makedirs(_CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception as e:  # pragma: no cover - read-only checkout
    print(f"[bench] compilation cache unavailable: {e!r}", file=sys.stderr,
          flush=True)


def _timed_sample(pipe, pose, ref, scfg, tag, video=False):
    """(compile_s, run_s): one warmup call + one steady-state call.

    device_get forces real completion; block_until_ready is unreliable over
    the axon relay."""
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(3), pose, ref, scfg,
                             video=video)
    _ = float(jnp.mean(out))
    compile_s = time.time() - t0
    print(f"[bench] {tag}: compile+warmup {compile_s:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    out = pipe.sample_frames(jax.random.PRNGKey(4), pose, ref, scfg,
                             video=video)
    _ = float(jnp.mean(out))
    return compile_s, time.time() - t0


def main() -> None:
    from magicdance_tpu.config import ModelConfig, SampleConfig
    from magicdance_tpu.pipeline import MagicPosePipeline

    cfg = ModelConfig()  # flagship APPEARANCE_POSE, SD1.5 scale
    pipe = MagicPosePipeline(cfg)
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    pipe.fast_init_params(rng, image_size=SIZE, zeros=True)
    pipe.cast_model_params(jnp.bfloat16)
    init_s = time.time() - t0
    print(f"[bench] init done in {init_s:.1f}s", file=sys.stderr, flush=True)

    pose = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, SIZE, SIZE, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 2 - 1

    # ---- kernel parity gate (before ANY timing): every Pallas kernel, fwd
    # and bwd, vs XLA math ON THIS CHIP — a miscompiled kernel must fail the
    # round, not set a fast-but-wrong record (VERDICT r4 item 7)
    kernel_parity = "skipped (non-tpu backend)"
    if jax.default_backend() == "tpu":
        from magicdance_tpu.ops.kernel_gate import run_gate

        t0 = time.time()
        kernel_parity = run_gate()  # raises AssertionError on mismatch
        print(f"[bench] kernel parity gate: {kernel_parity} "
              f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True)

    # ---- headline: EXACT reference-parity recipe -------------------------
    scfg = SampleConfig(steps=STEPS, cfg_scale=7.0)
    compile_s, run_s = _timed_sample(pipe, pose, ref, scfg, "exact")
    fps = FRAMES / run_s

    # arithmetic ceiling context (BENCH.md "Where the time goes"): per frame
    # per DDIM step ≈ 2 full UNet forwards (appearance write amortized over
    # the frame batch) + 1 pose-CN encoder ≈ 0.85 TFLOP ⇒ 42.5 TFLOP per
    # DDIM-50 frame; v5e peak ≈ 197 TFLOPs bf16 ⇒ exact parity maxes
    # ≈ 4.6 f/s at 100 % MFU. The 8 f/s driver target exceeds one chip's
    # arithmetic ceiling for this workload; vs_baseline reads accordingly.
    TFLOP_PER_FRAME = 42.5
    V5E_PEAK_TFLOPS = 197.0
    exact_ceiling_fps = V5E_PEAK_TFLOPS / TFLOP_PER_FRAME

    detail = {
        "frames_batch": FRAMES,
        "steps": STEPS,
        "seconds_per_frame": round(run_s / FRAMES, 3),
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        # stale-prewarm detector: a warm hit on this program is ~60 s; the
        # r03 cold miss was 731.9 s (see module docstring)
        "compile_cache_hit": compile_s < 180.0,
        "mfu_pct": round(100.0 * fps * TFLOP_PER_FRAME / V5E_PEAK_TFLOPS, 1),
        "exact_ceiling_fps": round(exact_ceiling_fps, 2),
        "vs_exact_ceiling": round(fps / exact_ceiling_fps, 4),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "kernel_parity": kernel_parity,
        # time-to-first-frame: init + compile of the exact serving program
        # (cold-start cost a serving product pays once per process)
        "ttff_s": round(init_s + compile_s, 1),
    }

    def _budget_left(tag: str) -> bool:
        spent = time.time() - _T_START
        if spent < BUDGET_S:
            return True
        detail[f"{tag}_skipped"] = f"budget ({spent:.0f}s >= {BUDGET_S:.0f}s)"
        print(f"[bench] {tag} row skipped: budget exhausted "
              f"({spent:.0f}s >= {BUDGET_S:.0f}s)", file=sys.stderr, flush=True)
        return False

    # ---- video mode: temporal UNet + overlap sampling --------------------
    # runs BEFORE turbo: if the budget fires, the dropped row must be the
    # re-derivable turbo number, never the video one
    if not RUN_VIDEO:
        detail["video_skipped"] = "BENCH_VIDEO=0"
    elif _budget_left("video"):
        try:
            from dataclasses import replace

            from magicdance_tpu.config import ModelVariant

            # the image pipeline's ~4.5 GB of bf16 params must leave HBM
            # before the (larger) temporal pipeline initializes — both
            # resident at once exhausts a 16 GB v5e (re-initialized after
            # the video leg for the turbo row; zeros-init is what the bench
            # measures anyway and costs ~16 s)
            pipe.params = None
            import gc

            gc.collect()

            vcfg = replace(cfg, variant=ModelVariant.APPEARANCE_POSE_TEMPORAL,
                           unet=replace(cfg.unet, use_motion_modules=True))
            vpipe = MagicPosePipeline(vcfg)
            vpipe.fast_init_params(jax.random.PRNGKey(7), image_size=SIZE,
                                   zeros=True)
            vpipe.cast_model_params(jnp.bfloat16)
            vframes = int(os.environ.get("BENCH_VIDEO_FRAMES", "24"))
            vpose = jax.random.uniform(jax.random.PRNGKey(8),
                                       (vframes, SIZE, SIZE, 3))
            vscfg = SampleConfig(steps=STEPS, cfg_scale=7.0)
            vcompile_s, vrun_s = _timed_sample(vpipe, vpose, ref, vscfg,
                                               "video", video=True)
            detail["video_fps"] = round(vframes / vrun_s, 4)
            detail["video_frames"] = vframes
            detail["video_compile_s"] = round(vcompile_s, 1)
            vpipe.params = None
            del vpipe
            gc.collect()
        except Exception as e:  # pragma: no cover - device-dependent
            detail["video_error"] = repr(e)[:200]
            print(f"[bench] video row failed: {e!r}", file=sys.stderr,
                  flush=True)
        finally:
            # drop any half-built video pipeline before re-initializing the
            # image params (both resident would exhaust HBM)
            if "vpipe" in locals():
                vpipe.params = None
                del vpipe
                import gc

                gc.collect()
            if pipe.params is None:
                pipe.fast_init_params(rng, image_size=SIZE, zeros=True)
                pipe.cast_model_params(jnp.bfloat16)

    # ---- turbo stack: the measured opt-in approximate envelope ----------
    # optional rows never sink the headline: record the error and move on
    turbo_modes = dict(deepcache_every=3, pose_every=3, uncond_every=2,
                       cfg_interval=(0.15, 0.85), bank_every=3,
                       bank_downsample=2, self_kv_downsample=2)
    if not RUN_TURBO:
        detail["turbo_skipped"] = "BENCH_TURBO=0"
    elif _budget_left("turbo"):
        try:
            tscfg = SampleConfig(steps=STEPS, cfg_scale=7.0, **turbo_modes)
            tcompile_s, trun_s = _timed_sample(pipe, pose, ref, tscfg, "turbo")
            detail["turbo_fps"] = round(FRAMES / trun_s, 4)
            detail["turbo_modes"] = {k: list(v) if isinstance(v, tuple) else v
                                     for k, v in turbo_modes.items()}
            detail["turbo_compile_s"] = round(tcompile_s, 1)
        except Exception as e:  # pragma: no cover - device-dependent
            detail["turbo_error"] = repr(e)[:200]
            print(f"[bench] turbo row failed: {e!r}", file=sys.stderr,
                  flush=True)

    # ---- turbo_max: DDIM-25 + full stack, the best quality-bounded config
    # (every SD user already accepts the step-count tradeoff; the reuse
    # stack is invisible next to it — BENCH.md turbo-quality table)
    # winning config of the round-5 lever sweeps (scripts/bench_turbo5.py
    # + bench_turbo6.py "combo"): strides 5/5/4, bank_every=8, 4x4 KV
    # pooling at the S=4096 sites, exact endpoints — 6.91 f/s at DDIM-25
    # (68.05 dB) and 8.18 f/s at DDIM-20 (67.73 dB vs same-steps exact)
    turbo_max_modes = dict(
        deepcache_every=5, pose_every=5, uncond_every=4,
        cfg_interval=(0.15, 0.85), bank_every=8,
        bank_downsample=4, bank_downsample_min_seq=4096,
        self_kv_downsample=4, self_kv_min_seq=4096,
        reuse_exact_first=2, reuse_exact_last=2)
    if not RUN_TURBO_MAX:
        detail["turbo_max_skipped"] = "BENCH_TURBO_MAX=0"
    elif _budget_left("turbo_max"):
        try:
            tmscfg = SampleConfig(steps=TURBO_MAX_STEPS, cfg_scale=7.0,
                                  **turbo_max_modes)
            tmcompile_s, tmrun_s = _timed_sample(pipe, pose, ref, tmscfg,
                                                 "turbo_max")
            detail["turbo_max_fps"] = round(FRAMES / tmrun_s, 4)
            detail["turbo_max_steps"] = TURBO_MAX_STEPS
            detail["turbo_max_modes"] = {
                k: list(v) if isinstance(v, tuple) else v
                for k, v in turbo_max_modes.items()}
            detail["turbo_max_compile_s"] = round(tmcompile_s, 1)
            detail["turbo_max_vs_target"] = round(
                FRAMES / tmrun_s / TARGET_FPS, 4)
        except Exception as e:  # pragma: no cover - device-dependent
            detail["turbo_max_error"] = repr(e)[:200]
            print(f"[bench] turbo_max row failed: {e!r}", file=sys.stderr,
                  flush=True)

    # ---- turbo_max PSNR guardrail: random weights, B=8, vs the SAME-steps
    # exact trajectory (schedule truncation itself is bounded separately:
    # DDIM-25-exact measured 63.4 dB vs DDIM-50-exact, BENCH.md)
    if not (RUN_QUALITY and RUN_TURBO_MAX):
        detail["turbo_max_quality_skipped"] = "BENCH_QUALITY=0"
    elif _budget_left("turbo_max_quality"):
        try:
            qb = 8
            pipe.fast_init_params(jax.random.PRNGKey(11), image_size=SIZE,
                                  scale=0.02)
            pipe.cast_model_params(jnp.bfloat16)
            qpose = pose[:qb]
            qexact = pipe.sample_frames(
                jax.random.PRNGKey(12), qpose, ref,
                SampleConfig(steps=TURBO_MAX_STEPS, cfg_scale=7.0))
            qturbo = pipe.sample_frames(
                jax.random.PRNGKey(12), qpose, ref,
                SampleConfig(steps=TURBO_MAX_STEPS, cfg_scale=7.0,
                             **turbo_max_modes))
            import numpy as np

            def to_u8(x):  # same convention as scripts/bench_turbo_quality
                return np.clip((np.asarray(x) + 1.0) * 127.5, 0,
                               255).astype(np.uint8)

            a = to_u8(qexact).astype(np.float64) / 255.0
            b = to_u8(qturbo).astype(np.float64) / 255.0
            mse = float(np.mean((a - b) ** 2))
            psnr = 99.0 if mse == 0 else float(-10.0 * np.log10(mse))
            detail["turbo_max_psnr_db"] = round(psnr, 2)
            detail["turbo_max_psnr_guardrail"] = (
                "ok" if psnr >= 65.0 else "FAIL (<65 dB)")
            print(f"[bench] turbo_max quality: {psnr:.2f} dB vs exact "
                  f"DDIM-{TURBO_MAX_STEPS} (B={qb}, random weights)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # pragma: no cover - device-dependent
            detail["turbo_max_quality_error"] = repr(e)[:200]
            print(f"[bench] turbo_max quality failed: {e!r}", file=sys.stderr,
                  flush=True)

    result = {
        "metric": f"{SIZE}x{SIZE} denoised frames/sec/chip @ DDIM-{STEPS} (CFG, appearance+pose)",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 4),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
