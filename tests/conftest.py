"""Test environment: force an 8-device virtual CPU mesh.

The reference can only exercise distribution through real torchrun
(SURVEY.md §4); JAX lets tests validate the full multi-chip sharding story on
host CPU devices.
"""

import os

# hard override: the session sitecustomize registers the "axon" TPU-tunnel
# PJRT plugin and sets jax_platforms="axon,cpu" via jax.config (overriding
# the env var), which would silently run every test over the remote TPU.
# Tests must run on virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not run on the TPU tunnel"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
