"""Device mesh + sharding layout for SPMD training/inference.

TPU-native replacement for the reference's NCCL stack (SURVEY.md §2.3):

  reference                                   here
  ---------                                   ----
  torchrun + dist.init_process_group("nccl")  jax.distributed / implicit
  DDP(bucket 128MB, grad hooks)               pjit over Mesh('data') — XLA
                                              emits gradient psum over ICI
  ZeroRedundancyOptimizer (ZeRO-1)            optimizer-state leaves sharded
                                              along 'data' (zero1_sharding);
                                              XLA inserts all-gather at the
                                              param update
  dist.barrier()                              not needed (SPMD program order)
  consolidate_state_dict(to=0)                orbax + multihost process-span
                                              save handles gathering

The mesh is 1-D ('data',) for the MagicPose workload — the 860M-param UNet
fits one chip, so DP is the profitable axis (SURVEY §2.3). The helpers below
are written against arbitrary mesh shapes so a ('data','model') mesh can be
introduced without changing call sites.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: tuple[str, ...] = ("data",),
    shape: Optional[tuple[int, ...]] = None,
    devices: Optional[list] = None,
) -> Mesh:
    """Build a Mesh over all (or given) devices.

    Default: every device on the 'data' axis. Multi-axis shapes lay devices
    out row-major so the fastest-varying axis maps to nearest-neighbor ICI
    links.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data", ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def _zero1_spec(shape: tuple[int, ...], n_shards: int) -> P:
    """Pick the largest axis divisible by n_shards to shard; else replicate.

    This is the ZeRO-1 layout: each device owns 1/n of the optimizer moments.
    Biases/norm scales (small, often indivisible) stay replicated — they are
    a rounding error of the state size.
    """
    if not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % n_shards == 0 and shape[i] >= n_shards:
            spec: list[Any] = [None] * len(shape)
            spec[i] = "data"
            return P(*spec)
    return P()


def zero1_sharding(tree: Any, mesh: Mesh) -> Any:
    """NamedShardings sharding each array leaf along 'data' where divisible.

    Apply to optimizer moments (and EMA copies) — the ZeRO-1 analog of
    train_tiktok.py:971-976. Scalar/empty leaves map to fully-replicated.
    """
    n = mesh.shape["data"]

    def leaf(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, _zero1_spec(tuple(shape), n))

    return jax.tree.map(leaf, tree)


def replicated_like(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


# ---------------------------------------------------------------------------
# tensor parallelism
# ---------------------------------------------------------------------------

# param-path rules for sharding the UNet/control branches along a 'model'
# axis: attention QKV + FF-in shard the OUTPUT feature dim (head-parallel),
# attention out-proj + FF-out shard the INPUT dim (summed by psum XLA
# inserts). Convs/norms/embeddings stay replicated — at SD1.5 widths the
# matmul params dominate the sharded compute.
_TP_COL = ("to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "fc1")
_TP_ROW = ("to_out", "out_proj", "fc2")
_TP_FF_COL = ("proj_in",)   # GEGLU FF input projection (inside 'ff')
_TP_FF_ROW = ("proj_out",)  # GEGLU FF output projection (inside 'ff')


def _tp_spec(path: tuple[str, ...], shape: tuple[int, ...], n: int) -> P:
    if len(shape) != 2 or path[-1] != "kernel":
        return P()
    parent = path[-2] if len(path) >= 2 else ""
    in_ff = len(path) >= 3 and path[-3] == "ff"
    col = parent in _TP_COL or (in_ff and parent in _TP_FF_COL)
    row = parent in _TP_ROW or (in_ff and parent in _TP_FF_ROW)
    if col and shape[1] % n == 0:
        return P(None, "model")
    if row and shape[0] % n == 0:
        return P("model", None)
    return P()


def tensor_parallel_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedShardings sharding attention/FF matmul weights along 'model'.

    Megatron-style column/row parallelism expressed purely as parameter
    shardings: pjit's sharding propagation partitions the matmuls and
    inserts the psum on the row-parallel outputs — no model-code changes.
    Biases of column-parallel layers shard with the output dim.
    """
    n = mesh.shape["model"]
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = _tp_spec(path, tuple(leaf.shape), n)
        if (
            spec == P()
            and path[-1] == "bias"
            and len(path) >= 2
            and (path[-2] in _TP_COL
                 or (len(path) >= 3 and path[-3] == "ff" and path[-2] in _TP_FF_COL))
            and leaf.shape[-1] % n == 0
        ):
            spec = P("model")
        out[path] = NamedSharding(mesh, spec)
    return traverse_util.unflatten_dict(out)
