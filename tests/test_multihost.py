"""2-process multi-host (DCN-shaped) smoke test on the CPU backend.

Forms a REAL 2-process JAX cluster (jax.distributed.initialize with gloo
CPU collectives), runs two data-parallel train steps where each process
contributes its local loader shard via mesh.put_batch /
jax.make_array_from_process_local_data, and asserts equivalence with a
single-process run over the identical global batch.  This is the only
executable coverage of the multi-process path (the reference has no
multi-host mode at all; its parallelism is single-process DataParallel,
reference train.py:67).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID", "PVG_MULTIHOST", "XLA_FLAGS"):
        env.pop(k, None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")
    # The worker script lives in tests/; the package imports from the repo
    # root regardless of how pytest was invoked.
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    from playablevideogeneration_tpu.data.synthetic import (
        build_synthetic_dataset,
    )

    data_root = str(tmp_path / "data")
    build_synthetic_dataset(data_root, videos_per_split=2, length=8,
                            height=16, width=16, actions_count=3)

    # --- 2-process cluster -------------------------------------------- #
    port = _free_port()
    multi_out = str(tmp_path / "multi.json")
    procs = []
    for pid in range(2):
        env = _clean_env()
        env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   PVG_MULTIHOST="1")
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "multi", data_root, multi_out],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    # --- single-process references over the identical global batch ---- #
    # 2 virtual devices in one process: the IDENTICAL sharded program —
    # the only difference from the cluster run is gloo transport.
    single2_out = str(tmp_path / "single2.json")
    result = subprocess.run(
        [sys.executable, WORKER, "single", data_root, single2_out, "2"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=900)
    assert result.returncode == 0, result.stderr[-3000:]
    # 1 device: different batch split, so the autoregressive E->D->R->E
    # recursion amplifies reassociation noise — looser tolerances.
    single_out = str(tmp_path / "single.json")
    result = subprocess.run(
        [sys.executable, WORKER, "single", data_root, single_out],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=900)
    assert result.returncode == 0, result.stderr[-3000:]

    with open(multi_out) as f:
        multi = json.load(f)
    with open(single2_out) as f:
        single2 = json.load(f)
    with open(single_out) as f:
        single = json.load(f)

    assert multi["process_count"] == 2 and multi["devices"] == 2
    assert single["process_count"] == 1
    # The 1-proc-2-dev reference must actually BE 2 virtual devices or
    # the rtol=1e-5 identical-program comparison below is meaningless.
    assert single2["devices"] == 2, "jax_num_cpu_devices had no effect"
    # Inputs and initial state must be IDENTICAL by construction; a
    # mismatch here means the shard assembly or init diverged, not the
    # step math.
    for ref_name, ref in (("1-proc-2-dev", single2), ("1-device", single)):
        np.testing.assert_allclose(
            multi["obs_sum"], ref["obs_sum"], rtol=1e-6,
            err_msg=f"global batch differs vs {ref_name}")
        np.testing.assert_allclose(
            multi["init_params_l1"], ref["init_params_l1"], rtol=1e-6,
            err_msg=f"initial params differ vs {ref_name}")
        np.testing.assert_allclose(
            multi["vgg_l1"], ref["vgg_l1"], rtol=1e-6,
            err_msg=f"VGG variables differ vs {ref_name}")
    # THE multi-host claim: 2 processes x 1 device computes exactly what
    # 1 process x 2 devices computes — same sharded program, the only
    # delta is gloo transport vs in-process collectives.  Any shard
    # mis-assembly in put_batch / make_array_from_process_local_data
    # shows as O(1) error here.
    np.testing.assert_allclose(multi["loss1"], single2["loss1"], rtol=1e-5,
                               err_msg="step-1 loss vs 1-proc-2-dev "
                                       "(cross-process semantic mismatch)")
    # Step 2 passes through Adam, whose first update is ~lr*sign(grad):
    # the gloo all-reduce bit-differs from the in-process collective, so
    # near-zero gradient components flip sign and move params by O(lr) —
    # the identical lr-scale drift the 8-device dryrun documents.
    np.testing.assert_allclose(multi["loss2"], single2["loss2"], rtol=2e-2,
                               err_msg="step-2 loss vs 1-proc-2-dev")
    np.testing.assert_allclose(multi["params_l1"], single2["params_l1"],
                               rtol=1e-2, err_msg="params L1 vs 1-proc-2-dev")

    # Against 1 device the batch splits differently; reassociation noise
    # is amplified by the autoregressive E->D->R->E recursion and by Adam
    # (the 8-device dryrun documents the same lr-scale drift), so the
    # device-count comparison gets engineering tolerances only.
    np.testing.assert_allclose(multi["loss1"], single["loss1"], rtol=1e-2,
                               err_msg="step-1 loss vs 1-device")
    np.testing.assert_allclose(multi["loss2"], single["loss2"], rtol=3e-2,
                               err_msg="step-2 loss vs 1-device")
    np.testing.assert_allclose(multi["params_l1"], single["params_l1"],
                               rtol=1e-2, err_msg="params L1 vs 1-device")
