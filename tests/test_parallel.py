"""Multi-device sharding tests on a virtual 8-device CPU mesh.

Runs in a subprocess with --xla_force_host_platform_device_count=8
(SURVEY.md §4 strategy) so the rest of the suite keeps a single device.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    result = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert result.returncode == 0, result.stderr[-3000:]
    assert "ok" in result.stdout


def test_mesh_and_shardings():
    """Mesh/replication helpers on however many devices exist."""
    import jax
    import numpy as np

    from playablevideogeneration_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    assert mesh.axis_names == (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS)
    n = len(jax.devices())
    batch = np.zeros((n * 2, 3), np.float32)
    sharded = mesh_lib.shard_batch(mesh, batch)
    assert sharded.shape == (n * 2, 3)
    replicated = mesh_lib.replicate(mesh, {"w": np.ones((4,), np.float32)})
    assert replicated["w"].shape == (4,)
