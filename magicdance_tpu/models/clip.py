"""CLIP ViT-L/14 text tower in Flax.

Rebuild of FrozenCLIPEmbedder (ref: ldm/modules/encoders/modules.py:88),
which wraps HF `openai/clip-vit-large-patch14` and returns
`last_hidden_state` of shape (B, 77, 768). Architecture: 12 pre-LN
transformer layers, 12 heads, hidden 768, quick-GELU MLP (x4), causal mask,
learned position embeddings over 77 tokens, final LayerNorm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from magicdance_tpu.config import CLIPTextConfig


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], c.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (head_dim ** -0.5) + causal_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(x.shape[0], x.shape[1], c.hidden_size)
        return dense("out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="layer_norm1")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + CLIPAttention(c, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="layer_norm2")(x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(c.hidden_size * 4, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """input_ids: (B, 77) int32 → last_hidden_state (B, 77, 768) fp32."""
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       param_dtype=jnp.float32, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (c.max_length, c.hidden_size),
            jnp.float32,
        )
        x = tok + pos[None, : input_ids.shape[1]].astype(self.dtype)

        s = input_ids.shape[1]
        causal = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)
        causal = causal[None, None]
        for i in range(c.num_layers):
            x = CLIPLayer(c, dtype=self.dtype, name=f"layer_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="final_layer_norm")(x.astype(jnp.float32))
        return x


def encode_long_prompt(
    encoder: CLIPTextEncoder,
    params,
    token_ids,
    windows: int = 3,
) -> jax.Array:
    """>77-token prompts via chunked windows (ref: cldm/hack.py:32
    _hacked_clip_forward — splits long prompts into 75-token windows wrapped
    in BOS/EOS, encodes each through the frozen 77-token encoder and
    concatenates the hidden states along the sequence axis).

    token_ids: (B, n) raw BPE ids WITHOUT bos/eos, padded with eos.
    Returns (B, windows*77, hidden).
    """
    cfg = encoder.cfg
    body = cfg.max_length - 2  # 75
    b, n = token_ids.shape
    total = windows * body
    pad = jnp.full((b, max(0, total - n)), cfg.eos_token_id, token_ids.dtype)
    ids = jnp.concatenate([token_ids[:, :total], pad], axis=1)
    outs = []
    for w in range(windows):
        chunk = ids[:, w * body : (w + 1) * body]
        chunk = jnp.concatenate(
            [
                jnp.full((b, 1), cfg.bos_token_id, ids.dtype),
                chunk,
                jnp.full((b, 1), cfg.eos_token_id, ids.dtype),
            ],
            axis=1,
        )
        outs.append(encoder.apply(params, chunk))
    return jnp.concatenate(outs, axis=1)
