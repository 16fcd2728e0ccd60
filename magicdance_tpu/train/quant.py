"""Weight-only int8 storage for the FROZEN parameter tree (training).

The image-stage train step is weight-streaming-bound, not MXU-bound
(BENCH.md round-2 profile: 0.83 s of async copy-start under a 0.35 s
step — the frozen bf16 VAE/CLIP/UNet tree streams from HBM every step,
several times under remat). This module stores the frozen tree as int8
with per-output-channel f32 scales and dequantizes to the compute dtype
inside the step — halving the bytes the weight stream reads at the cost
of a convert (VERDICT r4 item 3: distinct from the REJECTED w8a8 compute
path — the MXU still runs bf16; only the storage/streaming format
changes).

Quantization: symmetric, per-last-axis channel, scale = max|w|/127.
Small leaves (norm scales/biases, tensors under 4096 elements) and
non-float leaves stay in their original dtype — they are streaming-noise
and quantizing them risks disproportionate error.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class QuantizedLeaf(struct.PyTreeNode):
    """int8 values + per-output-channel f32 scales; a normal pytree node,
    so sharding/jit/checkpoint treat q and scale as ordinary leaves."""

    q: jax.Array
    scale: jax.Array


def _should_quantize(p) -> bool:
    return (hasattr(p, "ndim") and p.ndim >= 2 and p.size >= 4096
            and p.dtype in (jnp.float32, jnp.bfloat16))


def quantize_tree(tree: Any) -> Any:
    """Replace eligible leaves with QuantizedLeaf(int8, f32 scale)."""

    def q(p):
        if not _should_quantize(p):
            return p
        w = p.astype(jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=tuple(range(p.ndim - 1)),
                       keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        qv = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return QuantizedLeaf(q=qv, scale=scale)

    return jax.tree.map(q, tree)


def dequantize_tree(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Inverse of quantize_tree: int8 * scale -> dtype, in-graph. Called at
    the top of the train step so XLA streams int8 from HBM and widens
    on-chip."""

    def dq(x):
        if isinstance(x, QuantizedLeaf):
            return (x.q.astype(jnp.float32) * x.scale).astype(dtype)
        return x

    return jax.tree.map(
        dq, tree, is_leaf=lambda x: isinstance(x, QuantizedLeaf))


def has_quantized(tree: Any) -> bool:
    found = [False]

    def chk(x):
        if isinstance(x, QuantizedLeaf):
            found[0] = True
        return x

    jax.tree.map(chk, tree, is_leaf=lambda x: isinstance(x, QuantizedLeaf))
    return found[0]
