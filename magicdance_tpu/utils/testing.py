"""Test/debug helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def randomize_zero_kernels(params, scale: float = 0.05, seed: int = 0):
    """Replace every all-zero kernel (>=2-D leaf) with small random values.

    At init, zero-initialized output layers (`conv_out`, `proj_out`,
    `zero_conv*` — SD/ControlNet semantics) make the UNet output exactly zero
    AND block gradient flow; real runs load pretrained weights. Tests that
    need signals/grads to flow call this first.
    """
    counter = [seed]

    def fill(p):
        counter[0] += 1
        if p.ndim >= 2 and float(jnp.abs(p).max()) == 0.0:
            return jax.random.normal(
                jax.random.PRNGKey(counter[0]), p.shape, dtype=p.dtype
            ) * jnp.asarray(scale, p.dtype)
        return p

    return jax.tree.map(fill, params)
