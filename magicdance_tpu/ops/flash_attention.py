"""Fused flash-attention kernels for the model's hot attention shapes.

Two custom shapes matter (SURVEY.md §7 "Pallas kernels"):
  1. plain self-attention at latent resolutions (S ∈ {4096, 1024, 256, 64});
  2. bank-read self-attention: query length S, keys/values drawn from the
     layer's own sequence AND the appearance bank (S_kv = S + S_bank) without
     materializing the concatenation (ref: attention.py:301-313).

This module currently routes through the XLA fallback; the Pallas kernels in
`magicdance_tpu.ops.pallas.flash` replace these bodies when available on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HAVE_PALLAS = None


def _pallas_available() -> bool:
    global _HAVE_PALLAS
    if _HAVE_PALLAS is None:
        try:
            from magicdance_tpu.ops.pallas import flash  # noqa: F401

            _HAVE_PALLAS = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover - import guard
            _HAVE_PALLAS = False
    return _HAVE_PALLAS


def flash_attention(q, k, v, *, scale: float):
    if _pallas_available():
        from magicdance_tpu.ops.pallas.flash import flash_attention as _fa

        return _fa(q, k, v, scale=scale)
    from magicdance_tpu.ops.attention import _xla_attention

    return _xla_attention(q, k, v, scale)


def flash_attention_two_source(q, k_self, v_self, k_bank, v_bank, *,
                               scale: float, bank_mask=None):
    if _pallas_available():
        from magicdance_tpu.ops.pallas.flash import flash_attention_two_source as _fa2

        return _fa2(q, k_self, v_self, k_bank, v_bank, scale=scale,
                    bank_mask=bank_mask)
    from magicdance_tpu.ops.attention import bank_read_attention

    return bank_read_attention(q, k_self, v_self, k_bank, v_bank, scale=scale,
                               impl="xla", bank_mask=bank_mask)


def _split(t, h):
    return t.reshape(t.shape[0], t.shape[1], h, t.shape[2] // h)


def flash_attention_fused(q, k, v, *, scale: float, num_heads: int):
    """Packed-layout (B, S, H*D) attention: heads split INSIDE the kernel by
    static lane slices, so no BSNH<->BHSD transpose ever touches HBM."""
    if _pallas_available():
        from magicdance_tpu.ops.pallas.flash import flash_attention_fused as _faf

        return _faf(q, k, v, scale=scale, num_heads=num_heads)
    from magicdance_tpu.ops.attention import _xla_attention

    out = _xla_attention(_split(q, num_heads), _split(k, num_heads),
                         _split(v, num_heads), scale)
    return out.reshape(q.shape)


def flash_attention_two_source_fused(q, k_self, v_self, k_bank, v_bank, *,
                                     scale: float, num_heads: int):
    """Packed-layout bank-read attention (ungated; bank batch ∈ {1, B})."""
    if _pallas_available():
        from magicdance_tpu.ops.pallas.flash import (
            flash_attention_two_source_fused as _fa2f,
        )

        return _fa2f(q, k_self, v_self, k_bank, v_bank, scale=scale,
                     num_heads=num_heads)
    from magicdance_tpu.ops.attention import bank_read_attention

    out = bank_read_attention(_split(q, num_heads), _split(k_self, num_heads),
                              _split(v_self, num_heads),
                              _split(k_bank, num_heads),
                              _split(v_bank, num_heads),
                              scale=scale, impl="xla")
    return out.reshape(q.shape)


def flash_attention_grouped(q, k, v, *, scale: float, num_heads: int):
    """Short-sequence self-attention in packed layout (B, S, H*D), S | 128:
    the motion-module temporal shape (S=16) and the ds8 spatial shape
    (S=64). One block-diagonal (128, 128) logits matmul per head covers
    128/S sequences with zero layout transposes."""
    if _pallas_available():
        from magicdance_tpu.ops.pallas.flash import (
            flash_attention_grouped as _fag,
        )

        return _fag(q, k, v, scale=scale, num_heads=num_heads)
    from magicdance_tpu.ops.attention import _xla_attention

    out = _xla_attention(_split(q, num_heads), _split(k, num_heads),
                         _split(v, num_heads), scale)
    return out.reshape(q.shape)
