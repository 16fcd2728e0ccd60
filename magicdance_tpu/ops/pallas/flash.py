"""Pallas TPU attention kernels for the MagicPose hot shapes.

Two kernels (SURVEY.md §7 "Pallas kernels"):

  * `flash_attention` — self-attention at latent resolutions
    (S ∈ {4096, 1024, 256, 64}, head dim ∈ {40, 80, 160}). The whole K/V for
    one (batch, head) fits VMEM at these sizes, so the kernel streams query
    blocks against the full K/V row: one fused
    QK^T → masked-free softmax (fp32) → PV pass with NO HBM logits
    materialization. The XLA fallback materializes (B, H, S, S) fp32 logits
    — 512 MB per image per layer at S=4096 — which is exactly what this
    kernel removes.

  * `flash_attention_two_source` — the bank-read shape: keys/values are the
    union of the layer's own sequence and the appearance bank
    (ref attention.py:301-313). Computed as two logit blocks sharing one
    joint softmax (joint max/denominator), so the K/V concat never exists
    anywhere. The bank may be batch-1 (one reference serving all frames /
    CFG replicas); the kernel broadcasts it via the BlockSpec index map
    instead of tiling it in HBM.

Layout: wrappers take (B, S, H, D) "BSNH" and reshape to (B*H, S, D) so the
kernel grid is (batch*heads, q_blocks). fp32 accumulation throughout
(guide: "Missing preferred_element_type" pitfall).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bq(s_total: int, d: int, itemsize: int = 2,
             vmem_budget: int = 24 * 1024 * 1024) -> int:
    """Largest query block keeping logits + kv + probs under budget.

    Capped at 256: measured on v5e, bq=512 is never faster and loses up to
    15% with multi-head blocks (bigger logits scratch starves double
    buffering)."""
    for bq in (256, 128, 64, 32, 16, 8):
        logits = bq * s_total * 4
        probs = bq * s_total * 4
        kv = 2 * s_total * max(d, 128) * itemsize
        if logits + probs + kv < vmem_budget:
            return bq
    return 8


def _pick_nh(h: int, s_kv_total: int, d: int, itemsize: int = 2,
             budget: int = 48 * 1024 * 1024) -> int:
    """Heads per kernel program. Multiple independent QK^T→softmax→PV chains
    in one program let Mosaic interleave MXU and VPU work across heads —
    measured ~19% faster than one-head programs at the SD1.5 ds1 shape
    (S=4096, D=40, B=32). Bounded by double-buffered K/V VMEM footprint
    (the budget also reproduces the measured optimum nh=4 for the
    two-source kernel, whose KV footprint doubles)."""
    lanes = ((max(d, 1) + 127) // 128) * 128
    per_head = s_kv_total * lanes * itemsize * 2 * 2  # K+V, double-buffered
    nh = 1
    for cand in (2, 4, 8):
        if h % cand == 0 and cand * per_head <= budget:
            nh = cand
    return nh


_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # one independent attention chain per head in the block; the Python loop
    # unrolls so Mosaic can overlap head i's softmax (VPU) with head i+1's
    # matmuls (MXU)
    for i in range(q_ref.shape[0]):
        q = q_ref[i]  # (BQ, D)
        k = k_ref[i]  # (S, D)
        v = v_ref[i]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[i] = (o / denom).astype(o_ref.dtype)


def _attn2_kernel_nomask(q_ref, k_ref, v_ref, kb_ref, vb_ref, o_ref, *,
                         scale: float):
    # two-source attention without the per-row bank gate: the gate multiply
    # is a full extra VPU pass over logits-sized data, so the ungated path
    # (every non-fused-CFG call) compiles this leaner body instead
    for i in range(q_ref.shape[0]):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        kb = kb_ref[i]
        vb = vb_ref[i]
        l_self = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        l_bank = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.maximum(
            jnp.max(l_self, axis=-1, keepdims=True),
            jnp.max(l_bank, axis=-1, keepdims=True),
        )
        p_self = jnp.exp(l_self - m)
        p_bank = jnp.exp(l_bank - m)
        denom = (
            jnp.sum(p_self, axis=-1, keepdims=True, dtype=jnp.float32)
            + jnp.sum(p_bank, axis=-1, keepdims=True, dtype=jnp.float32)
        )
        o = jax.lax.dot_general(
            p_self.astype(v_ref.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o + jax.lax.dot_general(
            p_bank.astype(vb_ref.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[i] = (o / denom).astype(o_ref.dtype)


def _attn2_kernel(mask_ref, q_ref, k_ref, v_ref, kb_ref, vb_ref, o_ref, *,
                  scale: float, num_heads: int):
    # per-batch-row bank gate (fused-CFG: uncond rows ignore the bank and
    # reduce EXACTLY to plain self-attention — the joint-max shift cancels).
    # mask arrives via scalar prefetch; all heads of one program belong to
    # the same batch row (nh divides num_heads).
    nh = q_ref.shape[0]
    gate = mask_ref[pl.program_id(0) * nh // num_heads].astype(jnp.float32)
    for i in range(nh):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        kb = kb_ref[i]
        vb = vb_ref[i]
        l_self = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        l_bank = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.maximum(
            jnp.max(l_self, axis=-1, keepdims=True),
            jnp.max(l_bank, axis=-1, keepdims=True),
        )
        p_self = jnp.exp(l_self - m)
        p_bank = jnp.exp(l_bank - m) * gate
        denom = (
            jnp.sum(p_self, axis=-1, keepdims=True, dtype=jnp.float32)
            + jnp.sum(p_bank, axis=-1, keepdims=True, dtype=jnp.float32)
        )
        o = jax.lax.dot_general(
            p_self.astype(v_ref.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o + jax.lax.dot_general(
            p_bank.astype(vb_ref.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[i] = (o / denom).astype(o_ref.dtype)


def _to_bhsd(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from_bhsd(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention_impl(q, k, v, *, scale: float):
    """q/k/v: (B, S, H, D) bf16/f32 → (B, Sq, H, D)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    qr, kr, vr = _to_bhsd(q), _to_bhsd(k), _to_bhsd(v)
    bq = min(_pick_bq(sk, d, q.dtype.itemsize), sq)
    nh = _pick_nh(h, sk, d, q.dtype.itemsize)
    grid = (b * h // nh, pl.cdiv(sq, bq))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qr.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nh, bq, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, sk, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, sk, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nh, bq, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_COMPILER_PARAMS,
    )(qr, kr, vr)
    return _from_bhsd(out, b, h)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention_two_source_impl(q, k_self, v_self, k_bank, v_bank, *,
                                     scale: float, bank_mask=None):
    """Bank-read attention; k_bank/v_bank batch ∈ {1, B} (broadcast via
    index map, never materialized per-frame). Optional bank_mask (B,) float:
    rows with 0 ignore the bank entirely (exactly plain self-attention) —
    the fused-CFG path batches cond and uncond rows in one call."""
    b, sq, h, d = q.shape
    sk = k_self.shape[1]
    sb = k_bank.shape[1]
    bb = k_bank.shape[0]
    qr, kr, vr = _to_bhsd(q), _to_bhsd(k_self), _to_bhsd(v_self)
    kbr, vbr = _to_bhsd(k_bank), _to_bhsd(v_bank)
    bq = min(_pick_bq(sk + sb, d, q.dtype.itemsize), sq)
    nh = _pick_nh(h, sk + sb, d, q.dtype.itemsize)
    grid = (b * h // nh, pl.cdiv(sq, bq))
    hb = h // nh  # head-programs per batch row

    # index maps receive the scalar-prefetch refs as trailing args
    if bb == 1:
        bank_map = lambda bh, qi, *_: (bh % hb, 0, 0)
    else:
        bank_map = lambda bh, qi, *_: (bh, 0, 0)

    io_specs = dict(
        in_specs=[
            pl.BlockSpec((nh, bq, d), lambda bh, qi, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, sk, d), lambda bh, qi, *_: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, sk, d), lambda bh, qi, *_: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, sb, d), bank_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, sb, d), bank_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nh, bq, d), lambda bh, qi, *_: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
    )
    if bank_mask is None:
        # ungated: leaner kernel, no scalar prefetch
        out = pl.pallas_call(
            functools.partial(_attn2_kernel_nomask, scale=scale),
            out_shape=jax.ShapeDtypeStruct(qr.shape, q.dtype),
            grid=grid,
            compiler_params=_COMPILER_PARAMS,
            **io_specs,
        )(qr, kr, vr, kbr, vbr)
        return _from_bhsd(out, b, h)

    mask1d = bank_mask.astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        **io_specs,
    )
    out = pl.pallas_call(
        functools.partial(_attn2_kernel, scale=scale, num_heads=h),
        out_shape=jax.ShapeDtypeStruct(qr.shape, q.dtype),
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
    )(mask1d, qr, kr, vr, kbr, vbr)
    return _from_bhsd(out, b, h)


# ---------------------------------------------------------------------------
# fused-layout kernels: q/k/v arrive as (B, S, H*D) — the raw projection
# output — heads are split INSIDE the kernel by static lane slices, so the
# host-side split-heads reshape/transpose around attention disappears
# entirely. Satisfies the TPU tiling rule (last block dim == full array dim).
# ---------------------------------------------------------------------------


def _attn_kernel_fused(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       num_heads: int):
    q = q_ref[0]  # (BQ, H*D)
    k = k_ref[0]  # (S, H*D)
    v = v_ref[0]
    hd = q.shape[-1] // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


def _attn2_kernel_fused(q_ref, k_ref, v_ref, kb_ref, vb_ref, o_ref, *,
                        scale: float, num_heads: int):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kb = kb_ref[0]
    vb = vb_ref[0]
    hd = q.shape[-1] // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        l_self = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        l_bank = jax.lax.dot_general(
            q[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.maximum(jnp.max(l_self, axis=-1, keepdims=True),
                        jnp.max(l_bank, axis=-1, keepdims=True))
        p_self = jnp.exp(l_self - m)
        p_bank = jnp.exp(l_bank - m)
        denom = (jnp.sum(p_self, axis=-1, keepdims=True)
                 + jnp.sum(p_bank, axis=-1, keepdims=True))
        o = jax.lax.dot_general(
            p_self.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o + jax.lax.dot_general(
            p_bank.astype(vb.dtype), vb[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads"))
def _flash_attention_fused_impl(q, k, v, *, scale: float, num_heads: int):
    """q/k/v: (B, S, H*D) — no head split on the host."""
    b, sq, hd_all = q.shape
    sk = k.shape[1]
    d = hd_all // num_heads
    bq = min(_pick_bq(sk, d, q.dtype.itemsize), sq)
    grid = (b, pl.cdiv(sq, bq))
    qspec = pl.BlockSpec((1, bq, hd_all), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, sk, hd_all), lambda bi, qi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_fused, scale=scale,
                          num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        compiler_params=_COMPILER_PARAMS,
    )(q, k, v)


def _grouped_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         num_heads: int, group: int):
    # Block-diagonal self-attention over flattened (rows, C) tiles: each
    # consecutive `group` rows form one independent attention sequence.
    # One (R, R) logits matmul per head covers R/group sequences at once —
    # the off-diagonal waste is free (the MXU is idle at these tiny-FLOP
    # shapes; the win is zero HBM relayouts), and the additive mask makes
    # the math EXACTLY per-sequence softmax(QK^T)V.
    q = q_ref[...]  # (R, H*D)
    k = k_ref[...]
    v = v_ref[...]
    r = q.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // group
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // group
    mask = jnp.where(rows == cols, 0.0, -1e30).astype(jnp.float32)
    hd = q.shape[-1] // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, sl] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads"))
def _flash_attention_grouped_impl(q, k, v, *, scale: float, num_heads: int):
    """Self-attention for SHORT sequences in packed layout — the temporal
    (motion-module) shape (B·hw, F=16, H*D) and the ds8 spatial shape
    (B, 64, H*D).

    XLA lowers these through BSNH→BHSD relayouts whose HBM round-trips
    dwarf the attention math (xprof "layout/copies" bucket,
    scripts/profile_video_step.py). Here q/k/v flatten to (B·S, C) — a
    free reshape, rows are already contiguous — and each kernel program
    handles 128 rows = 128/S whole sequences with ONE MXU-shaped
    (128, 128) logits matmul per head, masked block-diagonally so the
    result is exactly per-sequence attention.

    Requires S | 128 and 128 | B·S (callers guard via the dispatch in
    `magicdance_tpu.ops.attention._pick_impl_packed`).
    """
    b, s, c = q.shape
    rows = b * s
    r = 128
    # hard correctness precondition (sequences straddling a 128-row program
    # boundary would silently attend only within their tile) — must survive
    # `python -O`, so not a bare assert
    if 128 % s != 0 or rows % r != 0:
        raise ValueError(
            f"flash_attention_grouped needs S | 128 and 128 | B*S, got "
            f"B={b}, S={s}")
    q2 = q.reshape(rows, c)
    k2 = k.reshape(rows, c)
    v2 = v.reshape(rows, c)
    spec = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_grouped_attn_kernel, scale=scale,
                          num_heads=num_heads, group=s),
        out_shape=jax.ShapeDtypeStruct((rows, c), q.dtype),
        grid=(rows // r,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q2, k2, v2)
    return out.reshape(b, s, c)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads"))
def _flash_attention_two_source_fused_impl(q, k_self, v_self, k_bank, v_bank,
                                           *, scale: float, num_heads: int):
    """Fused-layout bank-read attention; bank batch ∈ {1, B}."""
    b, sq, hd_all = q.shape
    sk = k_self.shape[1]
    sb = k_bank.shape[1]
    bb = k_bank.shape[0]
    d = hd_all // num_heads
    bq = min(_pick_bq(sk + sb, d, q.dtype.itemsize), sq)
    grid = (b, pl.cdiv(sq, bq))
    qspec = pl.BlockSpec((1, bq, hd_all), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, sk, hd_all), lambda bi, qi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    bank_map = (lambda bi, qi: (0, 0, 0)) if bb == 1 else (
        lambda bi, qi: (bi, 0, 0))
    bspec = pl.BlockSpec((1, sb, hd_all), bank_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn2_kernel_fused, scale=scale,
                          num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, bspec, bspec],
        out_specs=qspec,
        compiler_params=_COMPILER_PARAMS,
    )(q, k_self, v_self, k_bank, v_bank)


# ---------------------------------------------------------------------------
# public entry points: differentiable wrappers. The primal (no-gradient)
# path runs the fast kernels above unchanged; under jax.grad the custom VJPs
# in `flash_vjp` kick in — forward-with-lse + flash backward kernels, so the
# S×S logits never reach HBM in either direction (the reference trains
# through xformers memory_efficient_attention fwd AND bwd,
# ref attention.py:202-250). The gated (bank_mask) two-source variant is a
# serving-only CFG construct and stays forward-only.
# ---------------------------------------------------------------------------


def flash_attention(q, k, v, *, scale: float):
    """q/k/v: (B, S, H, D) → (B, Sq, H, D). Differentiable."""
    from magicdance_tpu.ops.pallas import flash_vjp

    return flash_vjp.mha(q, k, v, scale)


def flash_attention_two_source(q, k_self, v_self, k_bank, v_bank, *,
                               scale: float, bank_mask=None):
    """Bank-read attention (BSNH). Differentiable when bank_mask is None."""
    if bank_mask is not None:
        return _flash_attention_two_source_impl(
            q, k_self, v_self, k_bank, v_bank, scale=scale,
            bank_mask=bank_mask)
    from magicdance_tpu.ops.pallas import flash_vjp

    return flash_vjp.mha_two_source(q, k_self, v_self, k_bank, v_bank, scale)


def flash_attention_fused(q, k, v, *, scale: float, num_heads: int):
    """Packed-layout (B, S, H*D) attention. Differentiable."""
    from magicdance_tpu.ops.pallas import flash_vjp

    return flash_vjp.mha_packed(q, k, v, scale, num_heads)


def flash_attention_two_source_fused(q, k_self, v_self, k_bank, v_bank, *,
                                     scale: float, num_heads: int):
    """Packed-layout bank-read attention (ungated). Differentiable."""
    from magicdance_tpu.ops.pallas import flash_vjp

    return flash_vjp.mha_two_source_packed(
        q, k_self, v_self, k_bank, v_bank, scale, num_heads)


def flash_attention_grouped(q, k, v, *, scale: float, num_heads: int):
    """Block-diagonal short-sequence attention (S | 128). Differentiable."""
    b, s, c = q.shape
    if 128 % s != 0 or (b * s) % 128 != 0:
        raise ValueError(
            f"flash_attention_grouped needs S | 128 and 128 | B*S, got "
            f"B={b}, S={s}")
    from magicdance_tpu.ops.pallas import flash_vjp

    return flash_vjp.mha_grouped(q, k, v, scale, num_heads)
