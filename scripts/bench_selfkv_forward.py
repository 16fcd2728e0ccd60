"""A/B: one 32-row cond UNet forward (bank read + pose residuals) with and
without self_kv_pool, full SD1.5 scale. Isolates whether the self-KV
pooling shrinks the ds1 attention kernels end-to-end."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from magicdance_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from magicdance_tpu.config import ModelConfig
from magicdance_tpu.pipeline import MagicPosePipeline

cfg = ModelConfig()
pipe = MagicPosePipeline(cfg)
pipe.fast_init_params(jax.random.PRNGKey(0), image_size=512, zeros=True)
pipe.cast_model_params(jnp.bfloat16)
model, params = pipe.model, pipe.params["model"]

B, L = 32, 64
x = jnp.zeros((B, L, L, 4))
t = jnp.zeros((B,), jnp.int32)
ctx = jnp.zeros((B, 77, 768))
ref = jnp.zeros((1, L, L, 4))
hint = jnp.zeros((B, 512, 512, 3))

def run(tag, pool):
    f = jax.jit(lambda p: model.apply(
        p, x, t, ctx, reference_noisy=ref, pose_hint=hint,
        self_kv_pool=pool))
    out = f(params); _ = float(jnp.mean(out))
    t0 = time.time()
    for _i in range(5):
        out = f(params)
    _ = float(jnp.mean(out))
    dt = (time.time() - t0) / 5
    print(f"{tag}: {dt*1e3:.1f} ms/forward", flush=True)
    return dt

a = run("exact   (pool=1)", 1)
b = run("self_kv (pool=2)", 2)
print(f"delta: {100*(1-b/a):.1f}%", flush=True)
