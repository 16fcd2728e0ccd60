"""Worker process for tests/test_multihost.py — NOT a pytest module.

Each of the 2 processes owns 2 virtual CPU devices; together they form a
4-device global ('data',) mesh over jax.distributed (the CPU analog of the
reference's torchrun+NCCL rendezvous, train_tiktok.py:552-562). The worker
runs ONE sharded MagicPose train step and an orbax save/restore across
processes, then prints MULTIHOST_OK for the parent to assert.

Usage: python tests/multihost_worker.py <pid> <nprocs> <port> <ckpt_dir>
"""

import os
import sys

pid = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
ckdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from magicdance_tpu.parallel.multihost import (  # noqa: E402
    initialize_distributed,
    is_primary,
    sync_global_devices,
)

os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
initialize_distributed(num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 2 * nprocs
assert is_primary() == (pid == 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from magicdance_tpu.config import (  # noqa: E402
    CLIPTextConfig,
    ControlNetConfig,
    FreezeRegime,
    ModelConfig,
    ModelVariant,
    OptimConfig,
    TrainConfig,
    UNetConfig,
    VAEConfig,
)
from magicdance_tpu.models import (  # noqa: E402
    AutoencoderKL,
    CLIPTextEncoder,
    MagicPoseModel,
)
from magicdance_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from magicdance_tpu.train.trainer import Trainer  # noqa: E402
from magicdance_tpu.utils.testing import randomize_zero_kernels  # noqa: E402

mc = ModelConfig(
    variant=ModelVariant.APPEARANCE_POSE,
    unet=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                    attention_resolutions=(1, 2), num_heads=2, context_dim=16),
    pose_control=ControlNetConfig(model_channels=32, channel_mult=(1, 2),
                                  num_res_blocks=1,
                                  attention_resolutions=(1, 2), num_heads=2,
                                  context_dim=16),
    vae=VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1),
    clip=CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=1,
                        num_heads=2, max_length=5),
    latent_size=8,
    dtype="float32",
)
model = MagicPoseModel(mc)
vae = AutoencoderKL(mc.vae)
clip = CLIPTextEncoder(mc.clip)

rng = jax.random.PRNGKey(0)  # same seed everywhere: replicated init values
B = 4  # per-process batch -> global 8 over the 4-device mesh
x = jnp.zeros((B, 8, 8, 4))
mp = model.init(rng, x, jnp.zeros((B,), jnp.int32), jnp.zeros((B, 5, 16)),
                reference_noisy=x[:1], pose_hint=jnp.zeros((B, 64, 64, 3)))
mp = randomize_zero_kernels(mp)
vp = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 3)),
              jax.random.PRNGKey(5))
cp = clip.init(jax.random.PRNGKey(3), jnp.zeros((1, 5), jnp.int32))

tc = TrainConfig(model=mc, optim=OptimConfig(learning_rate=1e-3, warmup_steps=2),
                 freeze=FreezeRegime.FINETUNE_CONTROL,
                 batch_size_per_device=2, image_size=16)
trainer = Trainer(tc, model, vae, clip)
state = trainer.create_state(mp, vp, cp)
mesh = trainer.mesh
assert len(mesh.devices.flatten()) == 2 * nprocs  # GLOBAL mesh

# host-local values -> global arrays laid out EXACTLY as the jitted step
# declares (replicated params, ZeRO-1 sharded optimizer moments): every
# process holds the full value, so it can serve any addressable shard
shardings = trainer.state_shardings(state)


def _to_global(a, sh):
    a = np.asarray(a)
    return jax.make_array_from_callback(a.shape, sh,
                                        lambda idx, _a=a: _a[idx])


state = jax.tree.map(_to_global, state, shardings)
local_batch = {
    "image": np.full((B, 16, 16, 3), 0.1, np.float32) * (pid + 1),
    "reference": np.full((B, 16, 16, 3), 0.2, np.float32),
    "pose": np.zeros((B, 64, 64, 3), np.float32),
    "input_ids": np.zeros((B, 5), np.int32),
}
batch = jax.tree.map(
    lambda a: multihost_utils.host_local_array_to_global_array(
        a, mesh, P("data")), local_batch)

step = trainer.jitted_step(state, batch)
new_state, metrics = step(state, batch, jax.random.PRNGKey(4))
loss = float(metrics["loss"])
gn = float(metrics["grad_norm"])
assert np.isfinite(loss) and np.isfinite(gn) and gn > 0, (loss, gn)
# replicated output: every process can read its local copy directly
assert int(np.asarray(jax.device_get(new_state.step))) == 1

# orbax save from the SHARDED (ZeRO-1) state + restore across processes
mgr = CheckpointManager(ckdir, save_total_limit=2)
mgr.save(1, new_state)
sync_global_devices("post-save")
restored = mgr.restore(1, target=new_state)
a = jax.device_get(jax.tree.leaves(new_state.train_params)[0])
b = jax.device_get(jax.tree.leaves(restored.train_params)[0])
np.testing.assert_allclose(np.asarray(a), np.asarray(b))

print(f"MULTIHOST_OK pid={pid} loss={loss:.6f} grad_norm={gn:.6f}", flush=True)
