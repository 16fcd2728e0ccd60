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


def weight_deviation(params_a, params_b, keyword: str = "") -> float:
    """Mean per-leaf squared L2 distance between two parameter trees,
    restricted to leaves whose '/'-joined path contains `keyword`.

    The training-drift probe from the reference (`estimate_deviation` /
    `_calc_dist`, ref train_tiktok.py:532-544): e.g. how far the
    appearance branch moved from the frozen UNet it was copied from
    (keyword='attn1'), or a trained tree vs its init. Leaves present in
    only one tree are ignored (the reference intersects keys the same
    way)."""
    flat_a = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params_a)[0]
    }
    flat_b = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params_b)[0]
    }
    keys = [k for k in flat_a if keyword in k and k in flat_b]
    if not keys:
        return 0.0
    total = 0.0
    for k in keys:
        a = jnp.asarray(flat_a[k], jnp.float32)
        b = jnp.asarray(flat_b[k], jnp.float32)
        total += float(jnp.sum((a - b) ** 2))
    return total / len(keys)
