"""Cross-attention (77-token context) dispatch experiment.

The XLA path materializes (B,H,Sq,77) f32 logits in HBM (~323 MB at the
ds1 shape) for softmax — the trace shows ~1.4 ms/step in the softmax `sub`
alone per site. The packed Pallas kernel keeps the whole chain in VMEM.
This measures XLA vs the packed fused kernel at the three latent
resolutions (end-to-end, incl. any reshapes each path needs).
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)[0, 0]))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)[0, 0]))
    return (time.time() - t0) / iters * 1e3


def main():
    from magicdance_tpu.ops.attention import _xla_attention
    from magicdance_tpu.ops.pallas.flash import flash_attention_fused

    B, SK = 32, 77
    for S, H, D in [(4096, 8, 40), (1024, 8, 80), (256, 8, 160)]:
        scale = D ** -0.5
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H * D), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, SK, H * D), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, SK, H * D), jnp.bfloat16)

        @jax.jit
        def f_xla(q, k, v):
            out = _xla_attention(q.reshape(B, S, H, D), k.reshape(B, SK, H, D),
                                 v.reshape(B, SK, H, D), scale)
            return out.reshape(B, S, H * D)

        @jax.jit
        def f_flash(q, k, v):
            return flash_attention_fused(q, k, v, scale=scale, num_heads=H)

        a = timed(f_xla, q, k, v)
        b = timed(f_flash, q, k, v)
        ref, got = f_xla(q, k, v), f_flash(q, k, v)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                    got.astype(jnp.float32))))
        print(f"S={S:5d} D={D:3d} Sk=77: xla {a:6.2f} ms   flash {b:6.2f} ms"
              f"   maxerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
