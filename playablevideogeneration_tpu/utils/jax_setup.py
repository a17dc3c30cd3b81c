"""Process-level JAX configuration for the CLIs.

Enables the persistent XLA compilation cache so repeated runs (resume,
play-from-checkpoint, evaluation) skip recompilation — the first compile
of the training program is tens of seconds, cached reloads are ~instant.

Also hosts the multi-host (multi-process over DCN) entry: the reference
tops out at single-process DataParallel (SURVEY.md §2.6); the TPU-native
successor is `jax.distributed.initialize` + a process-spanning mesh, so a
pod-slice run is `PVG_MULTIHOST=1 python -m ...cli.train` on every host.
"""
from __future__ import annotations

import os


def setup_jax(cache_dir: str = None, multihost: bool = None):
    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "pvg_tpu_xla"))
    if multihost is None:
        multihost = os.environ.get("PVG_MULTIHOST", "0") == "1"
    import jax

    # PVG_PLATFORM=cpu|tpu force-selects the backend via jax.config, which
    # wins even on hosts whose sitecustomize pins JAX_PLATFORMS.  Must be
    # set before the process group forms (backend selection is final once
    # devices exist).
    platform = os.environ.get("PVG_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if multihost:
        setup_multihost()

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def setup_multihost():
    """Initializes the DCN process group (multi-host data parallelism,
    SURVEY.md §2.6).  On TPU pods the coordinator/process topology is
    auto-detected from the TPU metadata; elsewhere JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES and JAX_PROCESS_ID configure it explicitly (that is
    also how the 2-process CPU smoke test forms its local cluster,
    tests/test_multihost.py).  Must run before any other JAX call.
    Single-host behavior is unchanged when PVG_MULTIHOST is unset."""
    import jax

    if os.environ.get("PVG_PLATFORM", "") == "cpu" or \
            os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # Cross-process collectives on the CPU backend need an explicit
        # implementation (TPU rides ICI/DCN natively).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    kwargs = {}
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    jax.distributed.initialize(**kwargs)


def process_info():
    """(process_index, process_count) — (0, 1) on a single host."""
    import jax

    return jax.process_index(), jax.process_count()
