"""Probe: can packing 3 x D=40 heads into one 128-lane tile beat the
"padded ceiling" of the SD1.5 attention shapes?

Round-1 BENCH.md argued the head-dim-40 -> 128-lane MXU padding is a fixed
3.2x tax; the round-1 judge countered that 3 x 40 = 120 lanes fit one tile,
so a head-packed layout might reclaim it. This script settles it with
measurements on the real chip.

The cycle-model question: on a weight-stationary 128x128 systolic array,
matmul time should go as M * ceil(K/128) * ceil(N/128) — i.e. contraction
padding (K=40 -> 128) costs NO extra cycles for fixed N, and every logit
element needs exactly D=40 MACs, so no rearrangement can exceed 40*128
useful MACs/cycle. If that model holds, block-diagonal packing (K: 120,
N: 3S) trades contraction waste for output waste exactly 1:1 and cannot
win. The probes below test the model directly:

  P1  QK^T contraction scaling: (256, K) x (K, 4096) for K in
      {40, 80, 120, 128, 256}. Model predicts flat time for K <= 128 and
      2x at K=256.
  P2  PV output scaling: (256, 4096) x (4096, N) for N in {40, 120, 128}.
      Model predicts flat (output-lane padding also cycle-free).
  P3  An actual block-diagonal packed attention kernel (G=3 heads/program,
      K/V pre-packed block-diagonally in HBM, packing cost EXCLUDED) vs the
      production per-head kernel on the same workload. Model predicts >= 1x
      (same MXU cycles, 3x the K/V VMEM/DMA traffic).
  P4  int8 MXU rate at the hot shapes (in-kernel quantization would avoid
      the HBM round-trips that killed w8a8): is int8 ~2x bf16 here?

Usage: python scripts/bench_head_packing.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(jnp.ravel(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jnp.ravel(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1e3  # ms


def probe_contraction():
    print("== P1: QK^T contraction scaling (256,K)x(K,4096) bf16, batch 64 ==")
    M, N, B = 256, 4096, 64
    base = None
    for K in (40, 80, 120, 128, 256):
        a = jax.random.normal(jax.random.PRNGKey(0), (B, M, K), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (B, K, N), jnp.bfloat16)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        t = timed(f, a, b)
        base = base or t
        print(f"  K={K:4d}: {t:7.3f} ms   ({t / base:4.2f}x vs K=40)", flush=True)


def probe_output():
    print("== P2: PV output scaling (256,4096)x(4096,N) bf16, batch 64 ==")
    M, K, B = 256, 4096, 64
    base = None
    for N in (40, 120, 128, 256):
        a = jax.random.normal(jax.random.PRNGKey(0), (B, M, K), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (B, K, N), jnp.bfloat16)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        t = timed(f, a, b)
        base = base or t
        print(f"  N={N:4d}: {t:7.3f} ms   ({t / base:4.2f}x vs N=40)", flush=True)


# ---------------------------------------------------------------------------
# P3: block-diagonal packed kernel. G heads per program; K/V arrive packed
# block-diagonally: kbd[(g*S + s), g*D:(g+1)*D] = K_g[s], zeros elsewhere.
# Q arrives lane-packed: qp[:, g*D:(g+1)*D] = Q_g. One QK^T of
# (BQ, G*D) x (G*D, G*S) gives all G heads' logits side-by-side; softmax is
# taken per S-slice; one PV of (BQ, G*S) x (G*S, G*D) returns lane-packed
# output. MXU cycles identical to per-head (see module docstring); this
# measures what the hardware actually does.
# ---------------------------------------------------------------------------


def _packed_kernel(q_ref, kbd_ref, vbd_ref, o_ref, *, scale, G, S):
    q = q_ref[0]            # (BQ, G*D)
    kbd = kbd_ref[0]        # (G*S, G*D)
    vbd = vbd_ref[0]
    logits = jax.lax.dot_general(
        q, kbd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale               # (BQ, G*S): head g's logits at cols g*S:(g+1)*S
    bq = logits.shape[0]
    lg = logits.reshape(bq, G, S)
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).reshape(bq, G * S)
    o = jax.lax.dot_general(
        p.astype(vbd_ref.dtype), vbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "G", "S"))
def packed_attention(qp, kbd, vbd, *, scale, G, S):
    """qp: (BG, S, G*D) lane-packed queries; kbd/vbd: (BG, G*S, G*D)
    block-diagonal. BG = B * (H // G)."""
    bg, sq, gd = qp.shape
    bq = 128
    grid = (bg, pl.cdiv(sq, bq))
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, G=G, S=S),
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, gd), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * S, gd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * S, gd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, gd), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qp, kbd, vbd)


def probe_packed_kernel():
    from magicdance_tpu.ops.pallas.flash import flash_attention

    print("== P3: block-diagonal packed kernel vs production per-head ==")
    B, H, S, D, G = 32, 6, 4096, 40, 3  # H=6 so G=3 divides evenly
    scale = D ** -0.5
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, S, H, D),
                                 jnp.bfloat16) for i in range(3))

    t_base = timed(lambda a, b, c: flash_attention(a, b, c, scale=scale),
                   q, k, v, iters=10)

    # pre-pack (cost EXCLUDED from timing: best case for packing)
    ng = H // G
    qg = q.reshape(B, S, ng, G, D).transpose(0, 2, 1, 3, 4)  # (B,ng,S,G,D)
    qp = qg.reshape(B * ng, S, G * D)

    def blockdiag(x):  # (B,S,H,D) -> (B*ng, G*S, G*D)
        xg = x.reshape(B, S, ng, G, D).transpose(0, 2, 3, 1, 4)  # B,ng,G,S,D
        out = jnp.zeros((B, ng, G, S, G, D), x.dtype)
        for g in range(G):
            out = out.at[:, :, g, :, g, :].set(xg[:, :, g])
        return out.reshape(B * ng, G * S, G * D)

    kbd = jax.device_put(blockdiag(k))
    vbd = jax.device_put(blockdiag(v))
    t_packed = timed(
        lambda a, b, c: packed_attention(a, b, c, scale=scale, G=G, S=S),
        qp, kbd, vbd, iters=10)

    # correctness of the packed math
    ref = flash_attention(q, k, v, scale=scale)  # (B,S,H,D)
    got = packed_attention(qp, kbd, vbd, scale=scale, G=G, S=S)
    got_bshd = got.reshape(B, ng, S, G, D).transpose(0, 2, 1, 3, 4).reshape(
        B, S, H, D)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got_bshd.astype(jnp.float32))))
    print(f"  per-head production kernel : {t_base:7.2f} ms")
    print(f"  block-diag packed (G=3)    : {t_packed:7.2f} ms  "
          f"(packing cost excluded)  maxerr {err:.2e}", flush=True)


def probe_int8():
    print("== P4: int8 vs bf16 MXU rate at the hot shapes, batch 64 ==")
    B = 64
    for (M, K, N) in ((256, 40, 4096), (256, 4096, 128), (4096, 320, 320)):
        kb = jax.random.normal(jax.random.PRNGKey(0), (B, M, K), jnp.bfloat16)
        nb = jax.random.normal(jax.random.PRNGKey(1), (B, K, N), jnp.bfloat16)
        ki = jax.random.randint(jax.random.PRNGKey(2), (B, M, K), -127, 127,
                                jnp.int8)
        ni = jax.random.randint(jax.random.PRNGKey(3), (B, K, N), -127, 127,
                                jnp.int8)
        fb = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        fi = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32))
        tb = timed(fb, kb, nb)
        ti = timed(fi, ki, ni)
        print(f"  ({M},{K})x({K},{N}): bf16 {tb:7.3f} ms  int8 {ti:7.3f} ms "
              f" ({tb / ti:4.2f}x)", flush=True)


if __name__ == "__main__":
    probe_contraction()
    probe_output()
    probe_packed_kernel()
    probe_int8()
