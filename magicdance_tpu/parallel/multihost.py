"""Multi-host (multi-slice) initialization & helpers.

TPU-native replacement for torchrun+NCCL rendezvous
(ref train_tiktok.py:552-562: RANK/WORLD_SIZE env + init_process_group):
`jax.distributed.initialize` wires DCN between hosts; inside a slice the
mesh rides ICI. Rank-conditional behavior (TB/ckpt on rank 0,
train_tiktok.py:558-573) maps to `is_primary()`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops on single-process runs. Arguments
    default to the standard env vars (JAX_COORDINATOR_ADDRESS etc.) or cloud
    TPU metadata autodetection.

    Must run before ANYTHING touches the XLA backend — so the
    already-initialized check is jax.distributed.is_initialized(), never
    jax.process_count() (which would itself initialize the backend and make
    the subsequent initialize() raise; caught by tests/test_multihost.py)."""
    if jax.distributed.is_initialized():
        return
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_primary() -> bool:
    """Rank-0 analog for logging/checkpoint gating."""
    return jax.process_index() == 0


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier (the reference's dist.barrier(),
    train_tiktok.py:1146) — rarely needed in SPMD, provided for host-side
    phases like dataset materialization."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
