"""Custom VJPs for the Pallas flash-attention kernels (training path).

The reference trains THROUGH memory-efficient attention — xformers provides
both forward and backward (ref: ldm/modules/attention.py:202-250,
motion_module.py:312). Until round 5 the Pallas kernels here were
forward-only, so training fell back to XLA attention whose backward
materializes (B, H, S, S) fp32 logits — at 512² stage-3 (S=4096, 8-16 frames
in batch) that is 4-8 GB per attention site under remat and the step
compile-OOMs on one v5e (BENCH.md). These kernels implement the standard
flash-attention backward recomputation scheme so nothing S×S ever reaches
HBM in either direction.

Structure (all kernels work on the flattened (B·H, S, D) "core" layout; the
packed (B, S, H·D) public entry points reshape around the core only under
differentiation — the zero-transpose primal kernels in `flash.py` still run
whenever no gradient is requested):

  * `_fwd*_lse_kernel` — forward that additionally writes the softmax
    log-sum-exp as a (B·H, 1, S) array (queries on the LANE axis — the
    orientation the dkv kernels consume, and the only layout whose (1, 1,
    bq) blocks satisfy the TPU last-two-dims tiling rule). The kernel
    transposes the (bq, 1) row stats in-register (verified supported by
    Mosaic on v5e).
  * `_dq*_kernel` — grid (bh, q_blocks). Recomputes logits → softmax stats
    locally (it needs the full K row anyway), so it takes NO lse input:
    dq = (P∘(dP − δ)) K · scale with δ = Σ Pn∘dP computed in-register.
  * `_dkv_kernel` — grid (bh, kv_blocks). Needs lse/δ per QUERY (lane axis),
    read as (1, S) rows: dV = Pᵀ dO, dK = (P∘(dPᵀ − δ)) Q · scale. The same
    kernel serves the self source and the bank source of two-source
    attention (the joint lse already encodes the shared softmax).
  * `_grouped_bwd_kernel` — the block-diagonal temporal shape: logits are
    tile-local (128×128), so the backward recomputes them and produces
    dq/dk/dv in one program with no residuals beyond q/k/v.

fp32 accumulation throughout; dS is cast to the input dtype only for the
MXU matmuls (standard flash-attention practice, matches the forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magicdance_tpu.ops.pallas import flash as _fwd

_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _block(s: int, cap: int = 256) -> int:
    """Largest power-of-two divisor of s, capped (all model seq lens are
    powers of two; remainder blocks would poison the dkv reduction)."""
    b = 1
    while b < cap and s % (b * 2) == 0:
        b *= 2
    return min(b, s)


# ---------------------------------------------------------------------------
# forward-with-lse kernels (nh=1: these only run under differentiation,
# where HBM footprint — not peak fwd throughput — is the target)
# ---------------------------------------------------------------------------


def _fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
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
    o_ref[0] = (o / denom).astype(o_ref.dtype)
    lse_ref[...] = (m + jnp.log(denom)).T[None]  # (1, 1, bq)


def _fwd2_lse_kernel(q_ref, k_ref, v_ref, kb_ref, vb_ref, o_ref, lse_ref, *,
                     scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kb = kb_ref[0]
    vb = vb_ref[0]
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
    o_ref[0] = (o / denom).astype(o_ref.dtype)
    lse_ref[...] = (m + jnp.log(denom)).T[None]


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, *, scale: float):
    q = q_ref[0]      # (bq, d)
    k = k_ref[0]      # (S, d)
    v = v_ref[0]
    do = do_ref[0]    # (bq, d)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
    pn = p / denom
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(pn * dp, axis=-1, keepdims=True)
    ds = (pn * (dp - delta)) * scale
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dq2_kernel(q_ref, k_ref, v_ref, kb_ref, vb_ref, do_ref, dq_ref, *,
                scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kb = kb_ref[0]
    vb = vb_ref[0]
    do = do_ref[0]
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
    pn_s = p_self / denom
    pn_b = p_bank / denom
    dp_s = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp_b = jax.lax.dot_general(
        do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = (
        jnp.sum(pn_s * dp_s, axis=-1, keepdims=True)
        + jnp.sum(pn_b * dp_b, axis=-1, keepdims=True)
    )
    ds_s = (pn_s * (dp_s - delta)) * scale
    ds_b = (pn_b * (dp_b - delta)) * scale
    dq = jax.lax.dot_general(
        ds_s.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq = dq + jax.lax.dot_general(
        ds_b.astype(kb.dtype), kb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale: float):
    k = k_ref[0]          # (bk, d)
    v = v_ref[0]
    q = q_ref[0]          # (S, d)
    do = do_ref[0]        # (S, d)
    lse = lse_ref[0]      # (1, S) — queries on the lane axis
    delta = delta_ref[0]
    lt = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale             # (bk, S)
    pt = jnp.exp(lt - lse)
    dv = jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                     # (bk, S)
    dst = (pt * (dpt - delta)) * scale
    dk = jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _grouped_bwd_kernel(q_ref, k_ref, v_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, *, scale: float,
                        num_heads: int, group: int):
    q = q_ref[...]   # (R, C)
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    r = q.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // group
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // group
    mask = jnp.where(rows == cols, 0.0, -1e30).astype(jnp.float32)
    hd = q.shape[-1] // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        doh = do[:, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        pn = p / denom
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(pn * dp, axis=-1, keepdims=True)
        ds = (pn * (dp - delta)) * scale
        pn_c = pn.astype(doh.dtype)
        ds_c = ds.astype(qh.dtype)
        # contract the QUERY axis (0,0): dV = PᵀdO, dK = dSᵀQ — expressed as
        # dot_general so Mosaic fuses the transpose into the MXU pass
        dv = jax.lax.dot_general(
            pn_c, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds_c, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq = jax.lax.dot_general(
            ds_c, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[:, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, sl] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host wrappers on the (BH, S, D) core layout
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("scale",))
def _core_fwd_lse(qr, kr, vr, *, scale: float):
    bh, sq, d = qr.shape
    sk = kr.shape[1]
    bq = _block(sq)
    grid = (bh, sq // bq)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_lse_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(qr.shape, qr.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, qi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, qi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, qi: (b, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_COMPILER_PARAMS,
    )(qr, kr, vr)
    return o, lse  # lse: (BH, 1, S)


@functools.partial(jax.jit, static_argnames=("scale",))
def _core2_fwd_lse(qr, kr, vr, kbr, vbr, *, scale: float):
    bh, sq, d = qr.shape
    sk = kr.shape[1]
    sb = kbr.shape[1]
    bhb = kbr.shape[0]
    bq = _block(sq)
    grid = (bh, sq // bq)
    bank_map = ((lambda b, qi: (b % bhb, 0, 0)) if bhb != bh
                else (lambda b, qi: (b, 0, 0)))
    o, lse = pl.pallas_call(
        functools.partial(_fwd2_lse_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(qr.shape, qr.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, qi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, qi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, d), bank_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, d), bank_map, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, qi: (b, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_COMPILER_PARAMS,
    )(qr, kr, vr, kbr, vbr)
    return o, lse


@functools.partial(jax.jit, static_argnames=("scale",))
def _core_dq(qr, kr, vr, dor, *, scale: float):
    bh, sq, d = qr.shape
    sk = kr.shape[1]
    bq = _block(sq)
    grid = (bh, sq // bq)
    qspec = pl.BlockSpec((1, bq, d), lambda b, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, sk, d), lambda b, qi: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qr.shape, qr.dtype),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=qspec,
        compiler_params=_COMPILER_PARAMS,
    )(qr, kr, vr, dor)


@functools.partial(jax.jit, static_argnames=("scale",))
def _core2_dq(qr, kr, vr, kbr, vbr, dor, *, scale: float):
    bh, sq, d = qr.shape
    sk = kr.shape[1]
    sb = kbr.shape[1]
    bhb = kbr.shape[0]
    bq = _block(sq)
    grid = (bh, sq // bq)
    bank_map = ((lambda b, qi: (b % bhb, 0, 0)) if bhb != bh
                else (lambda b, qi: (b, 0, 0)))
    qspec = pl.BlockSpec((1, bq, d), lambda b, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, sk, d), lambda b, qi: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, sb, d), bank_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dq2_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qr.shape, qr.dtype),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, bspec, bspec, qspec],
        out_specs=qspec,
        compiler_params=_COMPILER_PARAMS,
    )(qr, kr, vr, kbr, vbr, dor)


@functools.partial(jax.jit, static_argnames=("scale",))
def _core_dkv(kr, vr, qr, dor, lse, delta, *, scale: float):
    """dK/dV for one K/V source. kr/vr: (BHk, Sk, D); qr/dor: (BH, S, D);
    lse/delta: (BH, 1, S) — queries on the lane axis. When BHk != BH
    (broadcast bank), the kernel runs per-(BH) and the caller reduces over
    the broadcast batch."""
    bh, sq, d = qr.shape
    sk = kr.shape[1]
    bhk = kr.shape[0]
    bk = _block(sk)
    grid = (bh, sk // bk)
    kv_map = ((lambda b, ki: (b % bhk, ki, 0)) if bhk != bh
              else (lambda b, ki: (b, ki, 0)))
    kvspec = pl.BlockSpec((1, bk, d), kv_map, memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, sq, d), lambda b, ki: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, 1, sq), lambda b, ki: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((1, bk, d), lambda b, ki: (b, ki, 0),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk, d), kr.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), vr.dtype),
        ),
        grid=grid,
        in_specs=[kvspec, kvspec, qspec, qspec, rowspec, rowspec],
        out_specs=(outspec, outspec),
        compiler_params=_COMPILER_PARAMS,
    )(kr, vr, qr, dor, lse, delta)
    return dk, dv


def _delta(dor, o):
    """rowsum(dO ∘ O) in the (BH, 1, S) lane-major layout dkv reads."""
    d = jnp.sum(dor.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    return d[:, None, :]


def _core_bwd(qr, kr, vr, o, lse, dor, scale):
    delta = _delta(dor, o)
    dq = _core_dq(qr, kr, vr, dor, scale=scale)
    dk, dv = _core_dkv(kr, vr, qr, dor, lse, delta, scale=scale)
    return dq, dk, dv


def _core2_bwd(qr, kr, vr, kbr, vbr, o, lse, dor, scale):
    bh = qr.shape[0]
    bhb = kbr.shape[0]
    delta = _delta(dor, o)
    dq = _core2_dq(qr, kr, vr, kbr, vbr, dor, scale=scale)
    dk, dv = _core_dkv(kr, vr, qr, dor, lse, delta, scale=scale)
    dkb, dvb = _core_dkv(kbr, vbr, qr, dor, lse, delta, scale=scale)
    if bhb != bh:
        # broadcast bank: per-row grads reduce over the broadcast batch
        b = bh // bhb
        dkb = dkb.reshape(b, bhb, *dkb.shape[1:]).sum(0)
        dvb = dvb.reshape(b, bhb, *dvb.shape[1:]).sum(0)
    return dq, dk, dv, dkb, dvb


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------


def _to_core(x):  # (B, S, H, D) -> (B*H, S, D)
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from_core(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _packed_to_core(x, h):  # (B, S, H*D) -> (B*H, S, D)
    b, s, hd = x.shape
    return _to_core(x.reshape(b, s, h, hd // h))


def _core_to_packed(x, b, h):
    bh, s, d = x.shape
    return _from_core(x, b, h).reshape(b, s, h * d)


# ---------------------------------------------------------------------------
# public custom-vjp entry points (primal = the fast flash.py kernels)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mha(q, k, v, scale):
    """(B, S, H, D) self-attention, differentiable."""
    return _fwd._flash_attention_impl(q, k, v, scale=scale)


def _mha_fwd(q, k, v, scale):
    b, _, h, _ = q.shape
    qr, kr, vr = _to_core(q), _to_core(k), _to_core(v)
    o, lse = _core_fwd_lse(qr, kr, vr, scale=scale)
    return _from_core(o, b, h), (qr, kr, vr, o, lse, b, h)


def _mha_bwd(scale, res, g):
    qr, kr, vr, o, lse, b, h = res
    dq, dk, dv = _core_bwd(qr, kr, vr, o, lse, _to_core(g), scale)
    return (_from_core(dq, b, h), _from_core(dk, b, h), _from_core(dv, b, h))


mha.defvjp(_mha_fwd, _mha_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mha_packed(q, k, v, scale, num_heads):
    """(B, S, H*D) packed self-attention, differentiable."""
    return _fwd._flash_attention_fused_impl(q, k, v, scale=scale,
                                            num_heads=num_heads)


def _mha_packed_fwd(q, k, v, scale, num_heads):
    b = q.shape[0]
    qr = _packed_to_core(q, num_heads)
    kr = _packed_to_core(k, num_heads)
    vr = _packed_to_core(v, num_heads)
    o, lse = _core_fwd_lse(qr, kr, vr, scale=scale)
    return _core_to_packed(o, b, num_heads), (qr, kr, vr, o, lse, b)


def _mha_packed_bwd(scale, num_heads, res, g):
    qr, kr, vr, o, lse, b = res
    gr = _packed_to_core(g, num_heads)
    dq, dk, dv = _core_bwd(qr, kr, vr, o, lse, gr, scale)
    return (_core_to_packed(dq, b, num_heads),
            _core_to_packed(dk, b, num_heads),
            _core_to_packed(dv, b, num_heads))


mha_packed.defvjp(_mha_packed_fwd, _mha_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def mha_two_source(q, k_self, v_self, k_bank, v_bank, scale):
    """(B, S, H, D) bank-read attention (ungated), differentiable.
    Bank batch ∈ {1, B}; for batch-1 banks the gradient sums over frames."""
    return _fwd._flash_attention_two_source_impl(
        q, k_self, v_self, k_bank, v_bank, scale=scale)


def _mha2_fwd(q, k_self, v_self, k_bank, v_bank, scale):
    b, _, h, _ = q.shape
    bb = k_bank.shape[0]
    qr = _to_core(q)
    kr, vr = _to_core(k_self), _to_core(v_self)
    kbr, vbr = _to_core(k_bank), _to_core(v_bank)
    o, lse = _core2_fwd_lse(qr, kr, vr, kbr, vbr, scale=scale)
    return _from_core(o, b, h), (qr, kr, vr, kbr, vbr, o, lse, b, h, bb)


def _mha2_bwd(scale, res, g):
    qr, kr, vr, kbr, vbr, o, lse, b, h, bb = res
    dq, dk, dv, dkb, dvb = _core2_bwd(qr, kr, vr, kbr, vbr, o, lse,
                                      _to_core(g), scale)
    return (_from_core(dq, b, h), _from_core(dk, b, h), _from_core(dv, b, h),
            _from_core(dkb, bb, h), _from_core(dvb, bb, h))


mha_two_source.defvjp(_mha2_fwd, _mha2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def mha_two_source_packed(q, k_self, v_self, k_bank, v_bank, scale, num_heads):
    """(B, S, H*D) packed bank-read attention (ungated), differentiable."""
    return _fwd._flash_attention_two_source_fused_impl(
        q, k_self, v_self, k_bank, v_bank, scale=scale, num_heads=num_heads)


def _mha2_packed_fwd(q, k_self, v_self, k_bank, v_bank, scale, num_heads):
    b = q.shape[0]
    bb = k_bank.shape[0]
    qr = _packed_to_core(q, num_heads)
    kr = _packed_to_core(k_self, num_heads)
    vr = _packed_to_core(v_self, num_heads)
    kbr = _packed_to_core(k_bank, num_heads)
    vbr = _packed_to_core(v_bank, num_heads)
    o, lse = _core2_fwd_lse(qr, kr, vr, kbr, vbr, scale=scale)
    return (_core_to_packed(o, b, num_heads),
            (qr, kr, vr, kbr, vbr, o, lse, b, bb))


def _mha2_packed_bwd(scale, num_heads, res, g):
    qr, kr, vr, kbr, vbr, o, lse, b, bb = res
    gr = _packed_to_core(g, num_heads)
    dq, dk, dv, dkb, dvb = _core2_bwd(qr, kr, vr, kbr, vbr, o, lse, gr, scale)
    return (_core_to_packed(dq, b, num_heads),
            _core_to_packed(dk, b, num_heads),
            _core_to_packed(dv, b, num_heads),
            _core_to_packed(dkb, bb, num_heads),
            _core_to_packed(dvb, bb, num_heads))


mha_two_source_packed.defvjp(_mha2_packed_fwd, _mha2_packed_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads", "group"))
def _grouped_bwd(q2, k2, v2, do2, *, scale: float, num_heads: int,
                 group: int):
    rows, c = q2.shape
    r = 128
    spec = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_grouped_bwd_kernel, scale=scale,
                          num_heads=num_heads, group=group),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, c), t.dtype) for t in (q2, k2, v2)
        ),
        grid=(rows // r,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q2, k2, v2, do2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mha_grouped(q, k, v, scale, num_heads):
    """(B, S, H*D) block-diagonal short-sequence attention (S | 128),
    differentiable — the motion-module training shape. Logits are tile-local,
    so the backward recomputes them (residuals = q/k/v only, no lse)."""
    return _fwd._flash_attention_grouped_impl(q, k, v, scale=scale,
                                              num_heads=num_heads)


def _mha_grouped_fwd(q, k, v, scale, num_heads):
    o = _fwd._flash_attention_grouped_impl(q, k, v, scale=scale,
                                           num_heads=num_heads)
    return o, (q, k, v)


def _mha_grouped_bwd(scale, num_heads, res, g):
    q, k, v = res
    b, s, c = q.shape
    dq, dk, dv = _grouped_bwd(
        q.reshape(b * s, c), k.reshape(b * s, c), v.reshape(b * s, c),
        g.reshape(b * s, c), scale=scale, num_heads=num_heads, group=s,
    )
    return (dq.reshape(b, s, c), dk.reshape(b, s, c), dv.reshape(b, s, c))


mha_grouped.defvjp(_mha_grouped_fwd, _mha_grouped_bwd)
