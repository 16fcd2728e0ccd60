"""Host-side prefetching loader: worker threads + double-buffered device puts.

Replaces torch DataLoader worker processes (ref train_tiktok.py:1128-1133)
with a thread pool producing numpy batches plus an explicit device prefetch
queue, so host decode/augment overlaps device compute (SURVEY.md §7 "Data
pipeline"). Batches are placed with the given sharding (batch dim over the
'data' mesh axis) so pjit consumes them without relayout.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax
import numpy as np


class PrefetchLoader:
    """Wraps a batch iterator; `workers` producer threads call `next` on
    independent iterators (factory), a consumer thread moves batches to
    device ahead of use."""

    def __init__(
        self,
        batch_iter_factory: Callable[[int], Iterator[dict]],
        workers: int = 2,
        host_depth: int = 4,
        device_depth: int = 2,
        sharding: Optional[Any] = None,
    ):
        self._host_q: "queue.Queue[dict]" = queue.Queue(maxsize=host_depth)
        self._dev_q: "queue.Queue[dict]" = queue.Queue(maxsize=device_depth)
        self._stop = threading.Event()
        self._sharding = sharding
        self._threads = []
        for w in range(workers):
            t = threading.Thread(
                target=self._produce, args=(batch_iter_factory(w),), daemon=True
            )
            t.start()
            self._threads.append(t)
        t = threading.Thread(target=self._transfer, daemon=True)
        t.start()
        self._threads.append(t)

    def _put_until_stop(self, q: "queue.Queue[dict]", item: dict) -> bool:
        """Blocking put that aborts when close() is called — a thread stuck
        in an unconditional Queue.put outlives close() and (for the transfer
        thread) can race device work against later compilations."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self, it: Iterator[dict]) -> None:
        try:
            for batch in it:
                if self._stop.is_set():
                    return
                if not self._put_until_stop(self._host_q, batch):
                    return
        except Exception as e:  # pragma: no cover - worker crash surfaces on get
            self._put_until_stop(self._host_q, {"__error__": repr(e)})

    def _resolve_sharding(self, key: str, value) -> Any:
        s = self._sharding
        if s is None:
            return None
        if isinstance(s, dict):
            return s.get(key)
        # a Mesh: shard the leading (batch) axis, rank-aware per value
        from jax.sharding import Mesh

        if isinstance(s, Mesh):
            from magicdance_tpu.parallel.mesh import batch_sharding

            return batch_sharding(s, ndim=value.ndim)
        return s  # a single Sharding — caller guarantees rank compatibility

    def _transfer(self) -> None:
        try:
            while not self._stop.is_set():
                try:
                    batch = self._host_q.get(timeout=0.2)
                except queue.Empty:
                    continue
                if "__error__" in batch:
                    self._put_until_stop(self._dev_q, batch)
                    return
                out = {}
                for k, v in batch.items():
                    sh = self._resolve_sharding(k, v)
                    out[k] = jax.device_put(v, sh) if sh is not None else jax.device_put(v)
                if not self._put_until_stop(self._dev_q, out):
                    return
        except Exception as e:  # surface on the consumer side, never hang
            self._put_until_stop(self._dev_q, {"__error__": repr(e)})

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        batch = self._dev_q.get()
        if "__error__" in batch:
            raise RuntimeError(f"data worker failed: {batch['__error__']}")
        return batch

    def close(self, timeout: float = 5.0) -> None:
        """Stop all worker/transfer threads and join them. Safe to call
        more than once. Leaked loader threads are not benign: a live
        transfer thread issues `jax.device_put` concurrently with whatever
        the process compiles next."""
        self._stop.set()
        for t in self._threads:
            t.join(timeout=timeout)
            if t.is_alive():  # pragma: no cover - requires a wedged device_put
                import warnings

                warnings.warn(
                    f"PrefetchLoader thread {t.name} survived close(); it may "
                    "still issue device transfers that race later compilations",
                    RuntimeWarning,
                )
        # release buffered batches (device buffers held by queued dicts)
        for q in (self._host_q, self._dev_q):
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def __enter__(self) -> "PrefetchLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
