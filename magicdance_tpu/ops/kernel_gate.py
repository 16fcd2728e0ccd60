"""On-chip kernel parity gate: assert every Pallas attention kernel (forward
AND backward) matches the XLA einsum math on the REAL backend before any
benchmark timing (VERDICT r4 weak #5: the grouped kernel's Mosaic lowering
was CI-tested only in interpret mode; a miscompile would silently produce
wrong-but-fast numbers).

`run_gate()` exercises the production dispatch shapes (non-128-aligned head
dim 40 included — the lane-slice paths most exposed to lowering bugs) and
returns "ok"; any mismatch raises AssertionError with the worst deviation.
Called by bench.py (detail["kernel_parity"]) and usable standalone:

    python -m magicdance_tpu.ops.kernel_gate
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _check(name: str, got, want, atol: float):
    got = np.asarray(got, dtype=np.float32)
    want = np.asarray(want, dtype=np.float32)
    err = float(np.max(np.abs(got - want)))
    if not np.isfinite(err) or err > atol:
        raise AssertionError(f"kernel parity FAILED [{name}]: "
                             f"max|Δ|={err:.3e} > {atol:.1e}")
    return err


def run_gate(verbose: bool = False) -> str:
    """Forward + gradient parity of all Pallas attention kernels vs XLA on
    the current default backend. Raises on mismatch; returns "ok"."""
    from magicdance_tpu.ops.attention import _xla_attention, bank_read_attention
    from magicdance_tpu.ops.pallas.flash import (
        flash_attention,
        flash_attention_fused,
        flash_attention_grouped,
        flash_attention_two_source,
        flash_attention_two_source_fused,
    )

    def rand(shape, seed, dtype=jnp.bfloat16):
        return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype)

    errs = {}

    # bf16 kernels vs bf16 XLA math: elementwise bf16 rounding alone gives
    # ~1e-2 deltas on O(1) outputs; gradients accumulate one more matmul
    ATOL_F, ATOL_G = 5e-2, 1e-1

    # --- plain self-attention, SD1.5 ds1-like shape (d=40: padded lanes) ---
    b, s, h, d = 2, 1024, 2, 40
    q, k, v = rand((b, s, h, d), 0), rand((b, s, h, d), 1), rand((b, s, h, d), 2)
    scale = d ** -0.5
    want = _xla_attention(q, k, v, scale)
    errs["bsnh_fwd"] = _check("bsnh_fwd",
                              flash_attention(q, k, v, scale=scale), want,
                              ATOL_F)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, scale=scale)
                               .astype(jnp.float32)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)
                               .astype(jnp.float32)))

    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for name, gf, gx in zip(("dq", "dk", "dv"), g_flash, g_xla):
        errs[f"bsnh_{name}"] = _check(f"bsnh_{name}", gf, gx, ATOL_G)

    # --- packed (fused-layout) kernel ---
    qp = q.reshape(b, s, h * d)
    kp = k.reshape(b, s, h * d)
    vp = v.reshape(b, s, h * d)
    errs["packed_fwd"] = _check(
        "packed_fwd",
        flash_attention_fused(qp, kp, vp, scale=scale, num_heads=h),
        want.reshape(b, s, h * d), ATOL_F)

    # --- two-source (bank-read), broadcast bank + gated variant ---
    sb = 1024
    kb = rand((1, sb, h, d), 3)
    vb = rand((1, sb, h, d), 4)
    want2 = bank_read_attention(q, k, v, kb, vb, scale=scale, impl="xla")
    errs["two_source_fwd"] = _check(
        "two_source_fwd",
        flash_attention_two_source(q, k, v, kb, vb, scale=scale), want2,
        ATOL_F)
    errs["two_source_packed_fwd"] = _check(
        "two_source_packed_fwd",
        flash_attention_two_source_fused(
            qp, kp, vp, kb.reshape(1, sb, h * d), vb.reshape(1, sb, h * d),
            scale=scale, num_heads=h),
        want2.reshape(b, s, h * d), ATOL_F)
    mask = jnp.array([1.0, 0.0])
    gated = flash_attention_two_source(q, k, v, kb, vb, scale=scale,
                                       bank_mask=mask)
    errs["two_source_gated_read"] = _check("two_source_gated_read",
                                           gated[0], want2[0], ATOL_F)
    errs["two_source_gated_plain"] = _check("two_source_gated_plain",
                                            gated[1], want[1], ATOL_F)

    def loss2_flash(q, k, v, kb, vb):
        return jnp.sum(jnp.sin(
            flash_attention_two_source(q, k, v, kb, vb, scale=scale)
            .astype(jnp.float32)))

    def loss2_xla(q, k, v, kb, vb):
        return jnp.sum(jnp.sin(
            bank_read_attention(q, k, v, kb, vb, scale=scale, impl="xla")
            .astype(jnp.float32)))

    g2_flash = jax.jit(jax.grad(loss2_flash, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, kb, vb)
    g2_xla = jax.jit(jax.grad(loss2_xla, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, kb, vb)
    for name, gf, gx in zip(("dq", "dk", "dv", "dkb", "dvb"),
                            g2_flash, g2_xla):
        errs[f"two_source_{name}"] = _check(f"two_source_{name}", gf, gx,
                                            ATOL_G)

    # --- grouped block-diagonal kernel (temporal S=16, ds1-like rows) ---
    gb, gs, gh, gd = 256, 16, 8, 40
    qg = rand((gb, gs, gh * gd), 10)
    kg = rand((gb, gs, gh * gd), 11)
    vg = rand((gb, gs, gh * gd), 12)
    gscale = gd ** -0.5
    wantg = _xla_attention(
        qg.reshape(gb, gs, gh, gd), kg.reshape(gb, gs, gh, gd),
        vg.reshape(gb, gs, gh, gd), gscale).reshape(gb, gs, gh * gd)
    errs["grouped_fwd"] = _check(
        "grouped_fwd",
        flash_attention_grouped(qg, kg, vg, scale=gscale, num_heads=gh),
        wantg, ATOL_F)

    def lossg_flash(q, k, v):
        return jnp.sum(jnp.sin(
            flash_attention_grouped(q, k, v, scale=gscale, num_heads=gh)
            .astype(jnp.float32)))

    def lossg_xla(q, k, v):
        out = _xla_attention(q.reshape(gb, gs, gh, gd),
                             k.reshape(gb, gs, gh, gd),
                             v.reshape(gb, gs, gh, gd), gscale)
        return jnp.sum(jnp.sin(out.reshape(gb, gs, gh * gd)
                               .astype(jnp.float32)))

    gg_flash = jax.jit(jax.grad(lossg_flash, argnums=(0, 1, 2)))(qg, kg, vg)
    gg_xla = jax.jit(jax.grad(lossg_xla, argnums=(0, 1, 2)))(qg, kg, vg)
    for name, gf, gx in zip(("dq", "dk", "dv"), gg_flash, gg_xla):
        errs[f"grouped_{name}"] = _check(f"grouped_{name}", gf, gx, ATOL_G)

    if verbose:
        for k_, v_ in errs.items():
            print(f"  {k_:28s} max|Δ| = {v_:.3e}")
    return "ok"


if __name__ == "__main__":
    import time

    t0 = time.time()
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    print(run_gate(verbose=True), f"({time.time() - t0:.1f}s)")
