"""Prototype: does w8a8 int8 (int32 accumulate) beat bf16 on the v5e MXU
for the UNet's hot matmul/conv shapes? Measures raw ops + the full
quantize-compute-dequantize sandwich.

Usage: python scripts/bench_int8.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)[0, :1]))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)[0, :1]))
    return (time.time() - t0) / iters * 1e3


def q8(x, axis):
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8), scale


def main():
    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- dense: (B*S, C) @ (C, C_out), the GEGLU proj_in at ds1 ----------
    for (m, kdim, n) in [(32 * 4096, 320, 2560), (32 * 1024, 640, 5120),
                         (32 * 256, 1280, 10240)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, kdim), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (kdim, n), jnp.bfloat16)

        @jax.jit
        def f_bf16(x, w):
            return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        @jax.jit
        def f_int8(x, w):
            xq, xs = q8(x, axis=1)          # per-row activation scale
            wq, ws = q8(w, axis=0)          # per-out-channel weight scale
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * xs * ws

        # int8 with PRE-quantized weights (serving: quantize once at load)
        wq0, ws0 = q8(w, axis=0)

        @jax.jit
        def f_int8_preq(x, wq, ws):
            xq, xs = q8(x, axis=1)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * xs * ws

        a = timed(f_bf16, x, w)
        b = timed(f_int8, x, w)
        c = timed(f_int8_preq, x, wq0, ws0)
        fl = 2 * m * kdim * n
        print(f"dense {m}x{kdim}x{n}: bf16 {a:6.2f} ms ({fl/a/1e9:6.0f} GF/s)  "
              f"int8-onfly {b:6.2f} ms  int8-preq {c:6.2f} ms ({fl/c/1e9:6.0f} GF/s)",
              flush=True)

    # ---- conv3x3 at the UNet ds1 shape -----------------------------------
    for (bb, hw, c_in, c_out) in [(32, 64, 320, 320), (32, 32, 640, 640)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (bb, hw, hw, c_in),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c_in, c_out),
                              jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def c_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        wq0, ws0 = q8(w.reshape(-1, c_out), axis=0)
        wq0 = wq0.reshape(3, 3, c_in, c_out)

        @jax.jit
        def c_int8(x, wq, ws):
            amax = jnp.max(jnp.abs(x))
            xs = jnp.maximum(amax, 1e-8) / 127.0
            xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, wq, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * xs * ws

        a = timed(c_bf16, x, w)
        b = timed(c_int8, x, wq0, ws0)
        fl = 2 * bb * hw * hw * 9 * c_in * c_out
        print(f"conv3x3 {bb}x{hw}^2x{c_in}->{c_out}: bf16 {a:6.2f} ms "
              f"({fl/a/1e9:6.0f} GF/s)  int8-preq {b:6.2f} ms ({fl/b/1e9:6.0f} GF/s)",
              flush=True)


if __name__ == "__main__":
    main()
