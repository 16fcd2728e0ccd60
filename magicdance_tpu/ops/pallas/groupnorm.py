"""Fused GroupNorm(32)+SiLU Pallas kernel — OPT-IN ONLY
(``MAGICDANCE_FUSED_GN=1``), measured a net end-to-end LOSS.

The UNet applies GroupNorm32 -> SiLU before most convs (ref openaimodel
GroupNorm32/ResBlock in_layers/out_layers); XLA computes the group stats in
one pass over the input and the normalize+affine+SiLU in a second fused
pass — 2 HBM reads + 1 write. This kernel keeps one batch row's activation
in VMEM across both phases: 1 read + 1 write — 1.4x vs XLA in isolation at
the three larger UNet GN shapes, but ~5% SLOWER on the full serving path
(0.945 vs 0.997 f/s): the custom call is a fusion barrier, and XLA was
already folding these elementwise ops into neighboring fusions. Kept for
re-evaluation on future toolchains; BENCH.md "What was tried" has the full
three-way measurement.

Group stats are computed lane-natively: per-channel sum/sumsq column
reductions (VPU-friendly, no (HW, G, C/G) lane-splitting reshape of the big
tensor), then the tiny (C,) vectors are group-reduced and broadcast back.
fp32 stats/affine regardless of input dtype (GroupNorm32 semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int,
                    eps: float):
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    cg = c // groups
    n = hw * cg
    # group-reduce via a one-hot (C, G) matmul: Mosaic cannot lane-split a
    # (C,) -> (G, C/G) reshape, but tiny MXU dots are free here
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    g_id = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    M = (ch_group == g_id).astype(jnp.float32)  # (C, G)
    s = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    ss = jnp.sum(x * x, axis=0, keepdims=True)
    sg = jnp.dot(s, M, preferred_element_type=jnp.float32)  # (1, G)
    ssg = jnp.dot(ss, M, preferred_element_type=jnp.float32)
    mean_g = sg / n
    var_g = ssg / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)  # (1,C)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[0] + bias_ref[0]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def groupnorm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                   groups: int = 32, eps: float = 1e-5) -> jax.Array:
    """x: (B, H, W, C); scale/bias: (C,) fp32. Returns SiLU(GN(x)) in
    x.dtype."""
    b, h, w, c = x.shape
    xr = x.reshape(b, h * w, c)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xr, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32))
    return out.reshape(b, h, w, c)
