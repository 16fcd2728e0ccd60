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
