"""Persistent XLA compilation cache (TPU-native hygiene; no ref equivalent).

One shared on-disk cache under <repo>/.cache/xla for every surface — the
driver's graft dryrun, bench.py, the bench scripts, and the test suite —
so multi-minute XLA compiles (2m+ for jit_train_step on this 1-core host;
~7 min for the full-scale sampler on the TPU) are paid once ever per
(program, backend) and hit the cache on every later run.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at <repo>/.cache/xla
    (or ``cache_dir``). Returns the directory, or None if unavailable."""
    import jax

    if cache_dir is None:
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(repo, ".cache", "xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception as e:  # read-only checkout / unknown config: run cold
        print(f"[compcache] compilation cache unavailable: {e!r}", flush=True)
        return None
