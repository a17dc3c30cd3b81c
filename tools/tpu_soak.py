"""End-to-end soak of the full offline pipeline on the REAL device backend.

Runs the complete reference workflow (train -> resume -> play ->
build_evaluation_dataset -> evaluate_dataset with EVERY pretrained
backbone active on random converted weights) as actual CLI subprocesses,
on whatever backend JAX picks by default — on the axon host that is the
real TPU chip.  This is the check that "works on CPU" cannot stand in
for: the jitted frame-metric programs, the FID/FVD embedders and the
uint8 readback paths all get device executions.

Mirrors the reference flow train.py -> build_evaluation_dataset.py:21-68
-> evaluate_dataset.py:22-58.

Usage:
    python tools/tpu_soak.py [--root /tmp/tpu_soak] [--platform cpu]

With no --platform the default backend (the real chip on the axon host)
is used.  Exit code 0 means every stage ran and data.yml carries finite
values for every enabled metric family.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def build_fixture(root: str, size: int = 32, length: int = 12,
                  actions: int = 3) -> str:
    import yaml

    from playablevideogeneration_tpu.data.synthetic import (
        build_synthetic_dataset,
        make_synthetic_config,
    )

    shutil.rmtree(root, ignore_errors=True)
    build_synthetic_dataset(root + "/data", videos_per_split=2, length=length,
                            height=size, width=size, actions_count=actions)
    cfg = make_synthetic_config(
        data_root=root + "/data", output_root=root + "/out", height=size,
        width=size, actions_count=actions, batch_size=2,
        observations_count=4, observation_stacking=1, hidden_state_size=8,
        state_features=8, pretraining_steps=1, max_steps=3)
    cfg["training"]["batching"]["observations_count_start"] = 4
    cfg["evaluation"]["batching"]["observations_count"] = 4
    # The builder reconstructs the test set at eval length with 2 GT frames.
    cfg["evaluation_dataset"]["ground_truth_observations_init"] = 2
    path = root + "/config.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def build_random_backbone_weights(weights_dir: str) -> None:
    """Random-init variables for every backbone, saved through the same
    npz format the converters produce — so all backbone code paths
    (resolution, loading, jit, device execution) are exercised even
    though no true pretrained weights exist on this host."""
    # The parent process must NOT initialize the default (TPU) backend:
    # the subprocess stages need the chip, and a single-client TPU would
    # be held by this parent.  Random weight-building is CPU work.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from playablevideogeneration_tpu.evaluation.metrics import i3d as i3d_lib
    from playablevideogeneration_tpu.evaluation.metrics import (
        inception as inc_lib,
    )
    from playablevideogeneration_tpu.models import vgg as vgg_lib
    from playablevideogeneration_tpu.utils import pretrained

    os.makedirs(weights_dir, exist_ok=True)
    key = jax.random.PRNGKey(0)
    pretrained.save_variables_npz(
        vgg_lib.random_vgg_variables(key),
        os.path.join(weights_dir, pretrained.WEIGHT_FILES["vgg19"]))
    inception_variables = inc_lib.random_inception_variables(key)
    # A random classifier head so the Inception Score path runs too (the
    # real converter keeps the checkpoint's 1008-way 'fc' head).
    rng0 = np.random.default_rng(1)
    inception_variables["params"]["fc"] = {
        "kernel": rng0.normal(0, 0.01, size=(2048, 1008)).astype(np.float32),
        "bias": np.zeros((1008,), np.float32),
    }
    pretrained.save_variables_npz(
        inception_variables,
        os.path.join(weights_dir, pretrained.WEIGHT_FILES["fid_inception"]))
    pretrained.save_variables_npz(
        i3d_lib.random_i3d_variables(key),
        os.path.join(weights_dir, pretrained.WEIGHT_FILES["i3d"]))
    rng = np.random.default_rng(0)
    lins = {f"lin{i}": rng.uniform(0.0, 1.0, size=(c,)).astype(np.float32)
            for i, c in enumerate((64, 128, 256, 512, 512))}
    np.savez(os.path.join(weights_dir, pretrained.WEIGHT_FILES["lpips_lin"]),
             **lins)


def build_eval_config(root: str, size: int = 32, length: int = 12,
                      actions: int = 3) -> str:
    import yaml

    cfg = {
        "logging": {"run_name": "synthetic",
                    "output_root": root + "/out/evaluation_results"},
        "data": {"target_input_size": [size, size], "actions_count": actions,
                 "ground_truth_available": True},
        "reference_data": {"data_root": root + "/data/test", "crop": None},
        "generated_data": {
            "data_root": root + "/out/results/synthetic/evaluation_dataset",
            "crop": None},
        "evaluation": {
            "evaluator": "evaluation.dataset_evaluator",
            "detector": "blob",
            "compute_inception_score": True,
            "batching": {"batch_size": 1, "observations_count": 4,
                         "skip_frames": 0, "observation_stacking": 1,
                         "num_workers": 1},
        },
    }
    path = root + "/eval_config.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def run_stage(name: str, argv: list, env: dict, log_dir: str,
              timeout: int = 1800) -> float:
    log_path = os.path.join(log_dir, f"{name}.log")
    start = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(argv, env=env, stdout=log,
                              stderr=subprocess.STDOUT, timeout=timeout,
                              cwd=REPO)
    elapsed = time.time() - start
    if proc.returncode != 0:
        sys.stderr.write(f"[tpu_soak] stage '{name}' FAILED "
                         f"(rc={proc.returncode}); last lines:\n")
        with open(log_path) as log:
            sys.stderr.write("".join(log.readlines()[-40:]))
        raise SystemExit(1)
    print(f"[tpu_soak] {name}: OK in {elapsed:.1f}s ({log_path})")
    return elapsed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/tpu_soak")
    parser.add_argument("--platform", default=None,
                        help="force a backend (e.g. cpu); default = real chip")
    parser.add_argument("--stages",
                        default="train,resume,play,build,evaluate",
                        help="comma-separated subset to run (fixture and "
                             "weights are rebuilt unless --keep-fixture)")
    parser.add_argument("--keep-fixture", action="store_true",
                        help="reuse an existing --root fixture/weights")
    args = parser.parse_args()
    stages_wanted = {s.strip() for s in args.stages.split(",") if s.strip()}
    known = {"train", "resume", "play", "build", "evaluate"}
    unknown = stages_wanted - known
    if unknown or not stages_wanted:
        raise SystemExit(f"--stages got {sorted(unknown) or 'nothing'}; "
                         f"known stages: {sorted(known)}")

    env = dict(os.environ)
    env.pop("PVG_PLATFORM", None)
    if args.platform:
        env["PVG_PLATFORM"] = args.platform
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    if args.keep_fixture:
        config = args.root + "/config.yaml"
        build_random_backbone_weights(args.root + "/weights")
        eval_config = build_eval_config(args.root)
    else:
        config = build_fixture(args.root)
        build_random_backbone_weights(args.root + "/weights")
        eval_config = build_eval_config(args.root)
    env["PVG_PRETRAINED_WEIGHTS"] = args.root + "/weights"
    log_dir = args.root + "/logs"
    os.makedirs(log_dir, exist_ok=True)

    times = {}
    pkg = "playablevideogeneration_tpu.cli"
    if "train" in stages_wanted:
        times["train"] = run_stage(
            "train", [sys.executable, "-u", "-m", f"{pkg}.train",
                      "--config", config], env, log_dir)
    if "resume" in stages_wanted:
        times["resume"] = run_stage(
            "resume", [sys.executable, "-u", "-m", f"{pkg}.train",
                       "--config", config], env, log_dir)
    if "play" in stages_wanted:
        times["play"] = run_stage(
            "play", [sys.executable, "-u", "-m", f"{pkg}.play",
                     "--config", config, "--frames", "8"], env, log_dir)
    if "build" in stages_wanted:
        times["build"] = run_stage(
            "build_evaluation_dataset",
            [sys.executable, "-u", "-m", f"{pkg}.build_evaluation_dataset",
             "--config", config], env, log_dir)
    if "evaluate" in stages_wanted:
        times["evaluate"] = run_stage(
            "evaluate_dataset",
            [sys.executable, "-u", "-m", f"{pkg}.evaluate_dataset",
             "--config", eval_config], env, log_dir)

    if "evaluate" not in stages_wanted:
        # No data.yml was (re)produced this run: validating one would
        # either crash (missing file) or silently PASS stale metrics
        # from a previous --keep-fixture run.
        print("[tpu_soak] " + json.dumps(
            {"platform": args.platform or "default(real chip)",
             "stage_seconds": {k: round(v, 1) for k, v in times.items()}}))
        print("[tpu_soak] PASS (partial): stages "
              f"{sorted(stages_wanted)} executed; metric validation "
              "requires the 'evaluate' stage")
        return

    import yaml

    results_path = (args.root +
                    "/out/evaluation_results/synthetic/data.yml")
    with open(results_path) as f:
        metrics = yaml.safe_load(f)
    # Every backbone was enabled with random weights: the metric families
    # must be REAL numbers, not '*_unavailable' markers.
    import math

    required = ["fid", "fvd", "lpips/avg", "inception_score", "mse/avg",
                "psnr/avg", "ssim/avg", "vgg_sim/avg", "detection/add/avg",
                "action_classification/linear/accuracy",
                "action_variance/avg_variance/mean"]
    missing = [k for k in required if k not in metrics]
    unavailable = [k for k in metrics if k.endswith("_unavailable")]
    bad = [k for k, v in metrics.items()
           if isinstance(v, float) and not math.isfinite(v)]
    summary = {
        "platform": args.platform or "default(real chip)",
        "stage_seconds": {k: round(v, 1) for k, v in times.items()},
        "metrics_count": len(metrics),
        "missing_families": missing,
        "unavailable_markers": unavailable,
        "nonfinite": bad,
        "fid": metrics.get("fid"),
        "fvd": metrics.get("fvd"),
        "lpips": metrics.get("lpips/avg"),
        "inception_score": metrics.get("inception_score"),
    }
    print("[tpu_soak] " + json.dumps(summary))
    if missing or unavailable or bad:
        raise SystemExit(1)
    print("[tpu_soak] PASS: full pipeline executed on "
          f"{summary['platform']} with all backbones active")


if __name__ == "__main__":
    main()
