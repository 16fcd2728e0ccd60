"""Microbench: GroupNorm STATS formulation in plain XLA — flax layout vs
channel-first layout.

The round-4 corrected video profile found norm statistics
(`convert_reduce_fusion`) are the #2 bucket: 170 ms/step, ~146 GB/s
effective — ~5x off the streaming ceiling. Hypothesis: flax's GroupNorm
reshapes the activation to (..., HW, G, C/G) and reduces with only
C/G = 10 channels in the lane axis (C=320, G=32), wasting ~12/13 of the
128 VPU lanes. A channel-first formulation (per-channel sum/sumsq over H,W
with all C lanes live, then a tiny (B,C)->(B,G) group combine) keeps the
big reduce lane-saturated and stays pure XLA — no custom-call fusion
barrier (the round-1 failure mode of the fused Pallas GN).

Usage: python scripts/bench_gn_stats.py   [B=32]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from flax import linen as nn


def timed(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.ravel(out)[0].astype(jnp.float32))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.ravel(out)[0].astype(jnp.float32))
    return (time.time() - t0) / iters * 1e3


def flax_gn(x, scale, bias, groups=32, eps=1e-5):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    y = gn.apply({"params": {"scale": scale, "bias": bias}},
                 x.astype(jnp.float32))
    y = y.astype(x.dtype)
    return y * jax.nn.sigmoid(y)


def channel_gn(x, scale, bias, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    gsz = c // groups
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))          # (B, C): lanes = C, all live
    s2 = jnp.sum(xf * xf, axis=(1, 2))     # (B, C)
    n = h * w * gsz
    mean_g = s1.reshape(b, groups, gsz).sum(-1) / n    # (B, G) — tiny
    ex2_g = s2.reshape(b, groups, gsz).sum(-1) / n
    var_g = ex2_g - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, gsz, axis=-1)[:, None, None, :]
    inv_c = jnp.repeat(inv_g, gsz, axis=-1)[:, None, None, :]
    y = (xf - mean_c) * (inv_c * scale) + bias
    y = y.astype(x.dtype)
    return y * jax.nn.sigmoid(y)


def main():
    B = int(os.environ.get("B", "32"))
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    for (h, c) in ((64, 320), (32, 640), (16, 1280), (8, 1280)):
        x = jax.random.normal(jax.random.PRNGKey(0), (B, h, h, c),
                              jnp.bfloat16)
        scale = jax.random.normal(jax.random.PRNGKey(1), (c,), jnp.float32)
        bias = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32)
        ff = jax.jit(flax_gn)
        fc = jax.jit(channel_gn)
        err = float(jnp.max(jnp.abs(
            ff(x, scale, bias).astype(jnp.float32)
            - fc(x, scale, bias).astype(jnp.float32))))
        tf = timed(ff, x, scale, bias)
        tc = timed(fc, x, scale, bias)
        gb = x.size * 2 / 1e9
        print(f"(B={B},{h}x{h},{c}): flax {tf:.3f} ms ({gb/tf*1e3:.0f} GB/s)"
              f"  channel {tc:.3f} ms ({gb/tc*1e3:.0f} GB/s)"
              f"  speedup {tf/tc:.2f}x  max_err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
