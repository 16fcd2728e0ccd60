"""Tensor-parallel sharding on a 2-D (data, model) CPU mesh: the UNet forward
under TP param shardings must equal the replicated forward."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from magicdance_tpu.config import UNetConfig
from magicdance_tpu.models.unet import UNet
from magicdance_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    tensor_parallel_shardings,
)
from magicdance_tpu.utils.testing import randomize_zero_kernels


def test_tp_shardings_cover_attention_and_ff():
    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(1, 2), num_heads=2, context_dim=16)
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 16)))
    mesh = make_mesh(("data", "model"), shape=(4, 2))
    sh = tensor_parallel_shardings(params["params"], mesh)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(sh)
    col = [k for k, s in flat.items() if s.spec == P(None, "model")]
    row = [k for k, s in flat.items() if s.spec == P("model", None)]
    assert any("to_q" in k for k in col)
    assert any("to_out" in k for k in row)
    assert any("ff" in k and "proj_in" in k for k in col)
    assert any("ff" in k and "proj_out" in k for k in row)
    # convs stay replicated
    assert all("conv" not in k[-2] for k in col + row)


def test_tp_forward_matches_replicated():
    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(1, 2), num_heads=2, context_dim=16)
    model = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    t = jnp.full((4,), 17, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 5, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    params = randomize_zero_kernels(params)

    ref, _ = model.apply(params, x, t, ctx, dtype=jnp.float32)

    mesh = make_mesh(("data", "model"), shape=(4, 2))
    psh = {"params": tensor_parallel_shardings(params["params"], mesh)}
    params_tp = jax.device_put(params, psh)
    x_tp = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))

    @jax.jit
    def fwd(p, x, t, ctx):
        out, _ = model.apply(p, x, t, ctx, dtype=jnp.float32)
        return out

    out = fwd(params_tp, x_tp, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
