"""Attention primitives: XLA reference paths + Pallas dispatch.

The reference delegates attention to xformers `memory_efficient_attention`
(ref: ldm/modules/attention.py:202-250) with an fp32-logit fallback
(attention.py:22,179-184, ATTN_PRECISION). Here the baseline path is plain
XLA einsum attention with fp32 softmax (XLA fuses this well on TPU), and the
hot shapes (bank-read self-attention, temporal attention) can dispatch to
fused Pallas flash kernels (`magicdance_tpu.ops.flash_attention`).

Layout convention: (batch, seq, heads, head_dim) — "BSNH" — throughout.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# Global attention-impl override. "auto" picks Pallas flash kernels on TPU
# for the big self-attention shapes, in serving AND training: the kernels
# carry custom VJPs (ops/pallas/flash_vjp.py — flash-attention backward
# recomputation), so gradients flow without materializing S×S logits.
# "xla" remains as the reference einsum path.
_IMPL_OVERRIDE: contextvars.ContextVar[str] = contextvars.ContextVar(
    "attention_impl", default="auto"
)


@contextlib.contextmanager
def attention_impl(impl: str):
    """Force an attention implementation ("xla" | "flash" | "auto") for code
    traced within this context."""
    token = _IMPL_OVERRIDE.set(impl)
    try:
        yield
    finally:
        _IMPL_OVERRIDE.reset(token)


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
) -> jax.Array:
    """Plain attention, fp32 logits/softmax, output in q.dtype.

    q: (B, Sq, H, D); k/v: (B, Sk, H, D).
    """
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Multi-head attention over BSNH tensors.

    impl: "xla" | "flash" | "auto". "auto" picks the Pallas flash kernel on
    TPU for shapes where it wins (long self-attention sequences), else XLA.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        impl = _pick_impl(q, k)
    if impl == "flash":
        from magicdance_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)


def _pick_impl(q: jax.Array, k: jax.Array) -> str:
    override = _IMPL_OVERRIDE.get()
    if override != "auto":
        return override
    on_tpu = jax.default_backend() == "tpu"
    sq, sk = q.shape[1], k.shape[1]
    # all latent-resolution self-attention goes through the Pallas kernels —
    # even at S=256 the XLA path pays for BSNH<->BHSK layout shuffles; only
    # short cross-attention (77-token context) stays on XLA, and very wide
    # heads (VAE's single 512-dim head) whose full-row K/V would not fit
    # VMEM alongside the logits.
    if on_tpu and sq >= 256 and sk >= 256 and q.shape[-1] <= 256:
        return "flash"
    return "xla"


def _split_heads(t: jax.Array, h: int) -> jax.Array:
    return t.reshape(t.shape[0], t.shape[1], h, t.shape[2] // h)


def _pick_impl_packed(sq: int, sk_total: int, d: int, *, bank: bool,
                      has_mask: bool, batch: int = 0) -> str:
    """Dispatch for packed (B, S, H*D) inputs. "flash_fused" = the
    lane-sliced kernels that skip the BSNH->BHSD transposes entirely —
    measured (v5e, B=32, scripts/bench_attn_layout.py) they win every
    self-attention shape (−5% at S=4096 to −59% at S=1024 end-to-end) and
    the bank shapes below S=4096; the gated (bank_mask) kernel only exists
    in BSNH layout. Short-KV cross-attention (77-token context) stays on
    XLA: the kernel measured −23% isolated at S=1024
    (scripts/bench_cross_attn.py) but end-to-end the swap was 0.997→0.986
    f/s — in-graph XLA already fuses the short-KV softmax chain well, and
    at S=4096 the padded 77-wide matmuls lose outright."""
    override = _IMPL_OVERRIDE.get()
    if override != "auto":
        return override
    on_tpu = jax.default_backend() == "tpu"
    # SHORT self-attention (the temporal/motion-module S=16 shape over b·hw
    # batch rows): XLA's BSNH→BHSD relayouts around the tiny einsums dominate
    # the math — route to the block-diagonal grouped kernel, which needs
    # S | 128 and whole 128-row tiles. Measured (v5e,
    # scripts/bench_grouped_attn.py): 1.73x at ds1 (b·hw=4096, C=320),
    # 1.13-1.47x at the deeper temporal sites; the spatial ds8 S=64 shape is
    # a wash (0.99x), so dispatch stops at S<=32.
    if (on_tpu and not bank and not has_mask and sq == sk_total and sq <= 32
            and 128 % sq == 0 and batch > 0 and batch * sq % 128 == 0
            and d <= 256
            and os.environ.get("MD_DISABLE_GROUPED_ATTN") != "1"):
        # `not has_mask` is a defensive guard: the grouped kernel has no mask
        # input, and today's callers never pass one on this path
        return "flash_grouped"
    if not (on_tpu and sq >= 256 and sk_total >= 256 and d <= 256):
        return "xla"
    if bank and (has_mask or sq >= 4096):
        return "flash"
    return "flash_fused"


def attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Multi-head attention on PACKED (B, S, H*D) projection outputs —
    the layer never splits heads on the host, so the eligible TPU path
    runs with zero layout transposes around the kernel."""
    d = q.shape[-1] // num_heads
    if scale is None:
        scale = d ** -0.5
    if impl == "auto":
        impl = _pick_impl_packed(q.shape[1], k.shape[1], d, bank=False,
                                 has_mask=False, batch=q.shape[0])
    if impl == "flash_fused":
        from magicdance_tpu.ops.flash_attention import flash_attention_fused

        return flash_attention_fused(q, k, v, scale=scale, num_heads=num_heads)
    if impl == "flash_grouped":
        from magicdance_tpu.ops.flash_attention import flash_attention_grouped

        return flash_attention_grouped(q, k, v, scale=scale,
                                       num_heads=num_heads)
    out = dot_product_attention(
        _split_heads(q, num_heads), _split_heads(k, num_heads),
        _split_heads(v, num_heads), scale=scale, impl=impl,
    )
    return out.reshape(q.shape)


def bank_read_attention_packed(
    q: jax.Array,
    k_self: jax.Array,
    v_self: jax.Array,
    k_bank: jax.Array,
    v_bank: jax.Array,
    *,
    num_heads: int,
    scale: Optional[float] = None,
    impl: str = "auto",
    bank_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Bank-read attention on PACKED (B, S, H*D) inputs (bank batch ∈ {1, B})."""
    d = q.shape[-1] // num_heads
    if scale is None:
        scale = d ** -0.5
    if impl == "auto":
        impl = _pick_impl_packed(q.shape[1], k_self.shape[1] + k_bank.shape[1],
                                 d, bank=True, has_mask=bank_mask is not None)
    if impl == "flash_fused":
        from magicdance_tpu.ops.flash_attention import (
            flash_attention_two_source_fused,
        )

        return flash_attention_two_source_fused(
            q, k_self, v_self, k_bank, v_bank, scale=scale, num_heads=num_heads
        )
    out = bank_read_attention(
        _split_heads(q, num_heads), _split_heads(k_self, num_heads),
        _split_heads(v_self, num_heads), _split_heads(k_bank, num_heads),
        _split_heads(v_bank, num_heads),
        scale=scale, impl=impl, bank_mask=bank_mask,
    )
    return out.reshape(q.shape)


def bank_read_attention(
    q: jax.Array,
    k_self: jax.Array,
    v_self: jax.Array,
    k_bank: jax.Array,
    v_bank: jax.Array,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
    bank_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Self-attention whose K/V are the union of the layer's own sequence and
    the appearance bank sequence (ref: attention.py:301-313 "read" mode:
    `context = cat([x_norm, *bank], dim=1)`).

    The bank may have batch 1 while q has batch B (one reference image shared
    by all frames / CFG replicas); it is broadcast without materializing
    B copies on the XLA path.

    q/k_self/v_self: (B, S, H, D); k_bank/v_bank: (Bb, Sb, H, D), Bb ∈ {1, B}.
    bank_mask: optional (B,) float — rows with 0 ignore the bank entirely
    (EXACTLY plain self-attention): the fused-CFG path batches cond (1.0)
    and uncond (0.0) rows through one call.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B = q.shape[0]
    if impl == "auto":
        impl = _pick_impl(q, k_self)
    if impl == "flash":
        from magicdance_tpu.ops.flash_attention import flash_attention_two_source

        return flash_attention_two_source(
            q, k_self, v_self, k_bank, v_bank, scale=scale, bank_mask=bank_mask
        )
    # XLA path: two logit blocks, one joint softmax (bank terms gated).
    logits_s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k_self, preferred_element_type=jnp.float32
    ) * scale
    logits_b = jnp.einsum(
        "bqhd,Bkhd->bhqk" if k_bank.shape[0] == 1 else "bqhd,bkhd->bhqk",
        q,
        k_bank,
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.maximum(
        jnp.max(logits_s, axis=-1, keepdims=True),
        jnp.max(logits_b, axis=-1, keepdims=True),
    )
    p_s = jnp.exp(logits_s - m)
    p_b = jnp.exp(logits_b - m)
    if bank_mask is not None:
        p_b = p_b * bank_mask.astype(p_b.dtype)[:, None, None, None]
    denom = p_s.sum(-1, keepdims=True) + p_b.sum(-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", p_s.astype(v_self.dtype), v_self,
        preferred_element_type=jnp.float32,
    )
    out = out + jnp.einsum(
        "bhqk,Bkhd->bqhd" if v_bank.shape[0] == 1 else "bhqk,bkhd->bqhd",
        p_b.astype(v_bank.dtype),
        v_bank,
        preferred_element_type=jnp.float32,
    )
    out = out / jnp.transpose(denom, (0, 2, 1, 3))
    return out.astype(q.dtype)
