"""Process-level JAX configuration for the CLIs.

Enables the persistent XLA compilation cache so repeated runs (resume,
play-from-checkpoint, evaluation) skip recompilation — the first compile
of the training program is tens of seconds, cached reloads are ~instant.
"""
from __future__ import annotations

import os


def setup_jax(cache_dir: str = None):
    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "pvg_tpu_xla"))
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
