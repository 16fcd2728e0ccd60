"""Sweep (nh, bq) for the two-source bank-read kernel at the S=4096 hot
shape (5 sites x 29 ms/step = 23% of the serving step; currently 76% of the
padded MXU ceiling)."""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp

from magicdance_tpu.ops.pallas import flash


def timed(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)[0, 0, 0]))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)[0, 0, 0]))
    return (time.time() - t0) / iters * 1e3


def main():
    B, S, H, D = 32, 4096, 8, 40
    scale = D ** -0.5
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, S, H, D),
                                 jnp.bfloat16) for i in range(3))
    kb, vb = (jax.random.normal(jax.random.PRNGKey(i), (1, S, H, D),
                                jnp.bfloat16) for i in range(3, 5))

    orig_bq, orig_nh = flash._pick_bq, flash._pick_nh
    base = None
    for nh in (2, 4, 8):
        for bq in (128, 256, 512):
            flash._pick_bq = lambda *a, _bq=bq, **kw: _bq
            flash._pick_nh = lambda *a, _nh=nh, **kw: _nh
            f = jax.jit(lambda q, k, v, kb, vb: flash.flash_attention_two_source(
                q, k, v, kb, vb, scale=scale))
            try:
                ms = timed(f, q, k, v, kb, vb)
            except Exception as e:  # vmem overflow etc.
                print(f"nh={nh} bq={bq}: FAIL {str(e)[:80]}", flush=True)
                continue
            if nh == 4 and bq == 256:
                base = ms
            print(f"nh={nh} bq={bq}: {ms:7.2f} ms", flush=True)
    flash._pick_bq, flash._pick_nh = orig_bq, orig_nh
    print(f"current default (nh=4, bq=256): {base} ms")


if __name__ == "__main__":
    main()
