"""Pallas flash-attention kernels vs the XLA reference path, run in
interpreter mode on CPU (the real kernels are exercised on TPU by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from magicdance_tpu.ops.attention import _xla_attention, bank_read_attention
from magicdance_tpu.ops.pallas.flash import (
    flash_attention,
    flash_attention_two_source,
)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


@pytest.mark.parametrize("s,d", [(128, 32), (64, 40)])
def test_flash_matches_xla(s, d):
    b, h = 2, 2
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    scale = d**-0.5
    ref = _xla_attention(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_two_source_matches_xla():
    b, h, s, sb, d = 2, 2, 64, 32, 32
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    kb = _rand((b, sb, h, d), 3)
    vb = _rand((b, sb, h, d), 4)
    scale = d**-0.5
    ref = bank_read_attention(q, k, v, kb, vb, scale=scale, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_two_source(q, k, v, kb, vb, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_two_source_bank_broadcast():
    """Bank batch 1 must broadcast across the frame batch inside the kernel."""
    b, h, s, sb, d = 3, 2, 64, 64, 32
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    kb = _rand((1, sb, h, d), 3)
    vb = _rand((1, sb, h, d), 4)
    scale = d**-0.5
    ref = bank_read_attention(q, k, v, kb, vb, scale=scale, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_two_source(q, k, v, kb, vb, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_two_source_bank_mask():
    """Rows with mask 0 must equal PLAIN self-attention exactly."""
    b, h, s, sb, d = 2, 2, 64, 32, 32
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    kb = _rand((1, sb, h, d), 3)
    vb = _rand((1, sb, h, d), 4)
    scale = d**-0.5
    mask = jnp.array([1.0, 0.0])
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_two_source(q, k, v, kb, vb, scale=scale,
                                         bank_mask=mask)
    read = bank_read_attention(q, k, v, kb, vb, scale=scale, impl="xla")
    plain = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(read[0]),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(plain[1]),
                               atol=2e-5, rtol=2e-5)


def test_xla_bank_mask_matches():
    b, h, s, sb, d = 2, 2, 16, 8, 16
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    kb = _rand((b, sb, h, d), 3)
    vb = _rand((b, sb, h, d), 4)
    scale = d**-0.5
    out = bank_read_attention(q, k, v, kb, vb, scale=scale, impl="xla",
                              bank_mask=jnp.array([1.0, 0.0]))
    read = bank_read_attention(q, k, v, kb, vb, scale=scale, impl="xla")
    plain = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(read[0]),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(plain[1]),
                               atol=2e-5, rtol=2e-5)


def test_attention_packed_matches_split():
    from magicdance_tpu.ops.attention import attention_packed

    b, s, h, d = 2, 64, 2, 32
    q = _rand((b, s, h * d), 10)
    k = _rand((b, s, h * d), 11)
    v = _rand((b, s, h * d), 12)
    ref = _xla_attention(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                         v.reshape(b, s, h, d), d**-0.5).reshape(b, s, h * d)
    out = attention_packed(q, k, v, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bank_read_packed_matches_split():
    from magicdance_tpu.ops.attention import bank_read_attention_packed

    b, s, sb, h, d = 2, 64, 32, 2, 32
    q = _rand((b, s, h * d), 10)
    k = _rand((b, s, h * d), 11)
    v = _rand((b, s, h * d), 12)
    kb = _rand((1, sb, h * d), 13)
    vb = _rand((1, sb, h * d), 14)
    ref = bank_read_attention(
        q.reshape(b, s, h, d), k.reshape(b, s, h, d), v.reshape(b, s, h, d),
        kb.reshape(1, sb, h, d), vb.reshape(1, sb, h, d), impl="xla",
    ).reshape(b, s, h * d)
    out = bank_read_attention_packed(q, k, v, kb, vb, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # gated variant
    mask = jnp.array([1.0, 0.0])
    gated = bank_read_attention_packed(q, k, v, kb, vb, num_heads=h,
                                       bank_mask=mask)
    plain = _xla_attention(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                           v.reshape(b, s, h, d), d**-0.5).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(gated[1]), np.asarray(plain[1]),
                               atol=2e-5, rtol=2e-5)


def test_fused_layout_kernels_match_reference():
    """The lane-sliced packed kernels (interpret mode) vs the XLA math."""
    from magicdance_tpu.ops.pallas.flash import (
        flash_attention_fused,
        flash_attention_two_source_fused,
    )

    b, s, sb, h, d = 2, 64, 64, 2, 32
    q = _rand((b, s, h * d), 20)
    k = _rand((b, s, h * d), 21)
    v = _rand((b, s, h * d), 22)
    kb = _rand((1, sb, h * d), 23)
    vb = _rand((1, sb, h * d), 24)
    scale = d**-0.5
    ref = _xla_attention(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                         v.reshape(b, s, h, d), scale).reshape(b, s, h * d)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_fused(q, k, v, scale=scale, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    ref2 = bank_read_attention(
        q.reshape(b, s, h, d), k.reshape(b, s, h, d), v.reshape(b, s, h, d),
        kb.reshape(1, sb, h, d), vb.reshape(1, sb, h, d), impl="xla",
    ).reshape(b, s, h * d)
    with pltpu.force_tpu_interpret_mode():
        out2 = flash_attention_two_source_fused(q, k, v, kb, vb, scale=scale,
                                                num_heads=h)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("b,s,h,d", [
    (16, 16, 4, 8),   # temporal shape: 16 sequences of 16 frames, 256 rows
    (2, 64, 2, 32),   # ds8 spatial shape: 2 sequences straddle one tile
    (8, 16, 2, 40),   # non-128 head dim (SD1.5 hd=40)
])
def test_grouped_kernel_matches_xla(b, s, h, d):
    """Block-diagonal grouped kernel == independent per-sequence attention."""
    from magicdance_tpu.ops.pallas.flash import flash_attention_grouped

    q = _rand((b, s, h * d), 30)
    k = _rand((b, s, h * d), 31)
    v = _rand((b, s, h * d), 32)
    scale = d**-0.5
    ref = _xla_attention(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                         v.reshape(b, s, h, d), scale).reshape(b, s, h * d)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_grouped(q, k, v, scale=scale, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grouped_dispatch_conditions():
    """_pick_impl_packed routes short self-attention to the grouped kernel
    only when the tile constraints hold (and never off-TPU here)."""
    from unittest import mock

    from magicdance_tpu.ops import attention as attn_mod

    with mock.patch.object(attn_mod.jax, "default_backend",
                           return_value="tpu"):
        pick = attn_mod._pick_impl_packed
        assert pick(16, 16, 40, bank=False, has_mask=False,
                    batch=8192) == "flash_grouped"
        # spatial ds8 S=64 measured a wash on-chip: stays on XLA
        assert pick(64, 64, 160, bank=False, has_mask=False,
                    batch=32) == "xla"
        # S doesn't divide 128
        assert pick(24, 24, 40, bank=False, has_mask=False,
                    batch=8192) == "xla"
        # rows not a multiple of 128
        assert pick(16, 16, 40, bank=False, has_mask=False, batch=3) == "xla"
        # cross-attention (sq != sk) stays on XLA
        assert pick(64, 77, 40, bank=False, has_mask=False, batch=32) == "xla"
        # bank reads never take the grouped path
        assert pick(64, 128, 40, bank=True, has_mask=False,
                    batch=32) != "flash_grouped"
    # off-TPU (this CPU test env): XLA
    assert attn_mod._pick_impl_packed(16, 16, 40, bank=False, has_mask=False,
                                      batch=8192) == "xla"


# ---------------------------------------------------------------------------
# custom-VJP gradient parity (round 5): the flash kernels are differentiable
# — grads must match the XLA einsum path's autodiff to fp32 tolerance.
# Interpret mode on CPU; the on-chip gate lives in scripts/bench_kernel_gate
# (run by bench.py before timing).
# ---------------------------------------------------------------------------


def _grads(fn, args):
    loss = lambda *a: jnp.sum(jnp.sin(fn(*a)))  # nonlinear reduce
    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


@pytest.mark.parametrize("s,d", [(128, 32), (64, 40)])
def test_flash_grads_match_xla(s, d):
    b, h = 2, 2
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    scale = d**-0.5
    ref = _grads(lambda q, k, v: _xla_attention(q, k, v, scale), (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        out = _grads(lambda q, k, v: flash_attention(q, k, v, scale=scale),
                     (q, k, v))
    for g, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("bb", [None, 1])
def test_flash_two_source_grads_match_xla(bb):
    b, h, s, sb, d = 2, 2, 64, 32, 32
    bank_b = bb or b
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    kb = _rand((bank_b, sb, h, d), 3)
    vb = _rand((bank_b, sb, h, d), 4)
    scale = d**-0.5
    args = (q, k, v, kb, vb)
    ref = _grads(lambda *a: bank_read_attention(*a, scale=scale, impl="xla"),
                 args)
    with pltpu.force_tpu_interpret_mode():
        out = _grads(
            lambda *a: flash_attention_two_source(*a, scale=scale), args)
    for g, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)


def test_fused_packed_grads_match_xla():
    from magicdance_tpu.ops.pallas.flash import (
        flash_attention_fused,
        flash_attention_two_source_fused,
    )

    b, s, sb, h, d = 2, 64, 64, 2, 32
    q = _rand((b, s, h * d), 20)
    k = _rand((b, s, h * d), 21)
    v = _rand((b, s, h * d), 22)
    kb = _rand((1, sb, h * d), 23)
    vb = _rand((1, sb, h * d), 24)
    scale = d**-0.5

    def xla_plain(q, k, v):
        out = _xla_attention(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                             v.reshape(b, s, h, d), scale)
        return out.reshape(b, s, h * d)

    ref = _grads(xla_plain, (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        out = _grads(
            lambda q, k, v: flash_attention_fused(q, k, v, scale=scale,
                                                  num_heads=h), (q, k, v))
    for g, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)

    def xla_bank(q, k, v, kb, vb):
        out = bank_read_attention(
            q.reshape(b, s, h, d), k.reshape(b, s, h, d),
            v.reshape(b, s, h, d), kb.reshape(1, sb, h, d),
            vb.reshape(1, sb, h, d), scale=scale, impl="xla")
        return out.reshape(b, s, h * d)

    ref2 = _grads(xla_bank, (q, k, v, kb, vb))
    with pltpu.force_tpu_interpret_mode():
        out2 = _grads(
            lambda *a: flash_attention_two_source_fused(
                *a, scale=scale, num_heads=h), (q, k, v, kb, vb))
    for g, r in zip(out2, ref2):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("b,s,h,d", [
    (16, 16, 4, 8),   # temporal shape
    (8, 16, 2, 40),   # SD1.5 head dim
])
def test_grouped_grads_match_xla(b, s, h, d):
    from magicdance_tpu.ops.pallas.flash import flash_attention_grouped

    q = _rand((b, s, h * d), 30)
    k = _rand((b, s, h * d), 31)
    v = _rand((b, s, h * d), 32)
    scale = d**-0.5

    def xla(q, k, v):
        out = _xla_attention(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                             v.reshape(b, s, h, d), scale)
        return out.reshape(b, s, h * d)

    ref = _grads(xla, (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        out = _grads(
            lambda q, k, v: flash_attention_grouped(q, k, v, scale=scale,
                                                    num_heads=h), (q, k, v))
    for g, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)
