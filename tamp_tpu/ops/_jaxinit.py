"""Shared JAX runtime configuration for the device compute paths.

Enables the persistent compilation cache (kernel compiles on the remote TPU
compile service can take minutes and occasionally fail transiently; caching
makes each (window, chunk, tables) configuration a one-time cost per
machine).  Opt out with TAMP_TPU_NO_JAX_CACHE=1.
"""

from __future__ import annotations

import os

_done = False


def ensure_jax_cache() -> None:
    global _done
    if _done or os.environ.get("TAMP_TPU_NO_JAX_CACHE"):
        _done = True
        return
    _done = True
    try:
        import jax

        path = os.environ.get(
            "TAMP_TPU_JAX_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "tamp_tpu", "jax_cache"
            ),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only
