"""Microbench: grouped block-diagonal kernel vs XLA for SHORT self-attention.

Shapes are the real video-pipeline sites:
  - temporal (motion module): (b*hw, F=16, C) at each UNet resolution
  - ds8 spatial self-attn: (B, 64, C=1280)

Run on the real TPU chip: python scripts/bench_grouped_attn.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from magicdance_tpu.ops.attention import _split_heads, dot_product_attention
from magicdance_tpu.ops.pallas.flash import flash_attention_grouped


def timeit(fn, *args, n=30):
    # device_get forces real completion; block_until_ready is unreliable
    # over the axon relay (see bench.py)
    _ = float(jnp.mean(fn(*args)))
    t0 = time.time()
    acc = None
    for _ in range(n):
        acc = fn(*args)
    _ = float(jnp.mean(acc))
    return (time.time() - t0) / n


def main():
    print("backend:", jax.default_backend())
    F = 16
    # (label, batch_rows, seq, heads, head_dim)
    cases = [
        ("temporal ds1 (64x64, C=320)", 4096, F, 8, 40),
        ("temporal ds2 (32x32, C=640)", 1024, F, 8, 80),
        ("temporal ds4 (16x16, C=1280)", 256, F, 8, 160),
        ("temporal ds8 (8x8, C=1280)", 64, F, 8, 160),
        ("spatial ds8 S=64 (B=32, C=1280)", 32, 64, 8, 160),
    ]
    failures = 0
    for label, b, s, h, d in cases:
        c = h * d
        q = jax.random.normal(jax.random.PRNGKey(0), (b, s, c), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, s, c), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, s, c), jnp.bfloat16)
        scale = d ** -0.5

        @jax.jit
        def xla_path(q, k, v):
            out = dot_product_attention(
                _split_heads(q, h), _split_heads(k, h), _split_heads(v, h),
                scale=scale, impl="xla")
            return out.reshape(q.shape)

        def grouped_path(q, k, v):
            return flash_attention_grouped(q, k, v, scale=scale, num_heads=h)

        t_xla = timeit(xla_path, q, k, v)
        t_grp = timeit(grouped_path, q, k, v)
        # correctness spot check (bf16 tolerance)
        a = jnp.asarray(xla_path(q, k, v), jnp.float32)
        g = jnp.asarray(grouped_path(q, k, v), jnp.float32)
        err = float(jnp.max(jnp.abs(a - g)))
        # parity gate: the real Mosaic lowering (non-128-aligned lane slices
        # at head_dim 40/80/160) is validated HERE on-chip — CI only runs the
        # kernel under interpret mode — so a mismatch must fail the run
        ok = err < 0.1  # bf16 softmax-attention tolerance at these shapes
        failures += 0 if ok else 1
        print(f"{label:36s} xla {t_xla*1e6:8.1f}us  grouped {t_grp*1e6:8.1f}us"
              f"  speedup {t_xla/t_grp:5.2f}x  maxerr {err:.4f}"
              f"{'' if ok else '  PARITY FAIL'}")
    if failures:
        print(f"{failures} parity failure(s)", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
