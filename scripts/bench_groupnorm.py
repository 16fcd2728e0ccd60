"""Microbench: fused Pallas GroupNorm+SiLU vs XLA at the UNet's GN shapes.

Usage: python scripts/bench_groupnorm.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(jnp.ravel(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jnp.ravel(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1e3


def xla_gn_silu(x, scale, bias, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    m = jnp.mean(xf, axis=(1, 3), keepdims=True)
    v = jnp.mean((xf - m) ** 2, axis=(1, 3), keepdims=True)
    y = ((xf - m) * jax.lax.rsqrt(v + eps)).reshape(b, h, w, c)
    y = y * scale + bias
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def main():
    from magicdance_tpu.ops.pallas.groupnorm import groupnorm_silu

    B = int(os.environ.get("B", "32"))
    for (h, c) in ((64, 320), (32, 640), (16, 1280), (8, 1280)):
        x = jax.random.normal(jax.random.PRNGKey(0), (B, h, h, c),
                              jnp.bfloat16)
        scale = jax.random.normal(jax.random.PRNGKey(1), (c,), jnp.float32)
        bias = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32)
        fx = jax.jit(xla_gn_silu)
        fp = jax.jit(lambda a, s, b_: groupnorm_silu(a, s, b_))
        err = float(jnp.max(jnp.abs(
            fx(x, scale, bias).astype(jnp.float32)
            - fp(x, scale, bias).astype(jnp.float32))))
        tx = timed(fx, x, scale, bias)
        tp = timed(fp, x, scale, bias)
        print(f"B={B} {h}x{h}x{c}: xla {tx:6.3f} ms  pallas {tp:6.3f} ms  "
              f"({tx / tp:4.2f}x)  maxerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
