"""Checkpoint save/restore via orbax.

Rebuild of the reference's checkpoint subsystem
(ref: utils/checkpoint.py — `model_state-{step}.th` +
`optimizer_state_latest.th` {state_dict, step, scaler_state_dict} (:87-119),
EMA-suffixed files (:111), rotation by save_total_limit (:27-42), HDFS
transparency (:54-60); resume logic train_tiktok.py:595-608; ZeRO
consolidation :1276). Orbax handles multi-host gathering natively, so there
is no explicit consolidate step; sharded ZeRO-1 optimizer state round-trips
with its sharding layout.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


class CheckpointManager:
    """step-indexed checkpoints under `{directory}/step_{N}` with rotation."""

    def __init__(self, directory: str, save_total_limit: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_total_limit = save_total_limit
        if _HAVE_ORBAX:
            self._ckptr = ocp.StandardCheckpointer()
        else:
            self._ckptr = None

    # -- paths ------------------------------------------------------------
    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def all_steps(self) -> list[int]:
        steps = []
        for d in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", d)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # -- save/restore ------------------------------------------------------
    def save(self, step: int, state: Any) -> None:
        path = self._path(step)
        if self._ckptr is not None:
            self._ckptr.save(path, state, force=True)
            self._ckptr.wait_until_finished()
        else:  # numpy fallback
            flat, treedef = jax.tree_util.tree_flatten(state)
            os.makedirs(path, exist_ok=True)
            np.savez(
                os.path.join(path, "state.npz"),
                *[np.asarray(x) for x in flat],
            )
        self._rotate()

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        path = self._path(step)
        if self._ckptr is not None:
            return self._ckptr.restore(path, target)
        flat, treedef = jax.tree_util.tree_flatten(target)
        data = np.load(os.path.join(path, "state.npz"))
        arrays = [data[k] for k in data.files]
        return jax.tree_util.tree_unflatten(treedef, arrays)

    def _rotate(self) -> None:
        """Keep only the newest `save_total_limit` checkpoints
        (ref checkpoint.py:27-42)."""
        steps = self.all_steps()
        excess = len(steps) - self.save_total_limit
        for s in steps[:max(0, excess)]:
            import shutil

            shutil.rmtree(self._path(s), ignore_errors=True)
