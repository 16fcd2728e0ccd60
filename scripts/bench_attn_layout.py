"""Microbench: BSNH-transposed Pallas kernels vs fused-layout kernels.

The serving profile shows ~30 ms/step of HBM-bound BSNH->BHSD transposes
around attention (BENCH.md). The fused-layout kernels take the raw
projection output (B, S, H*D) and split heads by static lane slices inside
the kernel, so those transposes vanish. This measures both paths
END-TO-END (including the host-side reshapes each needs) at the SD1.5 hot
shapes on the real chip.

Usage: python scripts/bench_attn_layout.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=20):
    # block_until_ready is unreliable over the axon relay (see bench.py);
    # a scalar device_get is the only trustworthy sync
    out = fn(*args)
    float(jnp.sum(out[0, 0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0, 0].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    from magicdance_tpu.ops.pallas.flash import (
        flash_attention,
        flash_attention_fused,
        flash_attention_two_source,
        flash_attention_two_source_fused,
    )

    B = int(os.environ.get("B", "32"))
    # SD1.5 latent self-attention shapes: (S, H, D)
    shapes = [(4096, 8, 40), (1024, 8, 80), (256, 8, 160)]
    for S, H, D in shapes:
        scale = D ** -0.5
        key = jax.random.PRNGKey(0)
        # layout A: split heads on host (current path) — input arrives as
        # the projection output (B, S, H*D)
        raw_q, raw_k, raw_v, raw_bk, raw_bv = (
            jax.random.normal(jax.random.PRNGKey(i), (B, S, H * D), jnp.bfloat16)
            for i in range(5)
        )
        bk1, bv1 = raw_bk[:1], raw_bv[:1]

        @jax.jit
        def path_bsnh(q, k, v):
            qs = q.reshape(B, S, H, D)
            ks = k.reshape(B, S, H, D)
            vs = v.reshape(B, S, H, D)
            o = flash_attention(qs, ks, vs, scale=scale)
            return o.reshape(B, S, H * D)

        @jax.jit
        def path_fused(q, k, v):
            return flash_attention_fused(q, k, v, scale=scale, num_heads=H)

        @jax.jit
        def path2_bsnh(q, k, v, kb, vb):
            qs = q.reshape(B, S, H, D)
            ks = k.reshape(B, S, H, D)
            vs = v.reshape(B, S, H, D)
            kbs = kb.reshape(kb.shape[0], S, H, D)
            vbs = vb.reshape(vb.shape[0], S, H, D)
            o = flash_attention_two_source(qs, ks, vs, kbs, vbs, scale=scale)
            return o.reshape(B, S, H * D)

        @jax.jit
        def path2_fused(q, k, v, kb, vb):
            return flash_attention_two_source_fused(
                q, k, v, kb, vb, scale=scale, num_heads=H)

        a = timed(path_bsnh, raw_q, raw_k, raw_v)
        bms = timed(path_fused, raw_q, raw_k, raw_v)
        # correctness
        ref = path_bsnh(raw_q, raw_k, raw_v)
        got = path_fused(raw_q, raw_k, raw_v)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"S={S:5d} D={D:3d} self : bsnh {a:7.2f} ms  fused {bms:7.2f} ms  "
              f"maxerr {err:.2e}", flush=True)

        a2 = timed(path2_bsnh, raw_q, raw_k, raw_v, bk1, bv1)
        b2 = timed(path2_fused, raw_q, raw_k, raw_v, bk1, bv1)
        ref2 = path2_bsnh(raw_q, raw_k, raw_v, bk1, bv1)
        got2 = path2_fused(raw_q, raw_k, raw_v, bk1, bv1)
        err2 = float(jnp.max(jnp.abs(ref2.astype(jnp.float32) - got2.astype(jnp.float32))))
        print(f"S={S:5d} D={D:3d} bank : bsnh {a2:7.2f} ms  fused {b2:7.2f} ms  "
              f"maxerr {err2:.2e}", flush=True)


if __name__ == "__main__":
    main()
