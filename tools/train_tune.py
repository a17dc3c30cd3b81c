"""Profile-guided train-step tuning on the real chip.

Round-2 analysis: the BAIR-class step (B=8, T=12, 256px, bf16, remat) ran
at 204 frames/s with neither roofline saturated (~18% MXU at 17.1
TFLOP/step) — the 11 serialized in-scan re-encodes dominate.  The lever
that attacks serialization directly is a WIDER PER-CHIP BATCH: the scan
length stays 11, but every step feeds the MXU more work, so utilization
rises at constant step count.  This tool measures frames/s across batch
sizes (and optional no-remat) on the real chip and prints one JSON line
per config.

Usage:
    python tools/train_tune.py --batches 8,16,24 [--no-remat] [--steps 6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(REPO, ".jax_cache"))


def measure(batch: int, remat: bool, steps: int, height: int = 256,
            width: int = 256, t: int = 12, remat_policy=None,
            subpixel=(0, 0, 4), extra_tpu=None) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from playablevideogeneration_tpu.training.bench_harness import (
        build_synthetic_trainer,
        chained_step_time,
        make_synthetic_batch,
    )

    trainer = build_synthetic_trainer(
        height=height, width=width, batch_size=batch, observations_count=t,
        remat=remat, remat_policy=remat_policy,
        rendering_subpixel=subpixel, output_root="/tmp/pvg_tune",
        extra_tpu=extra_tpu)
    b = make_synthetic_batch(batch_size=batch, observations_count=t,
                             height=height, width=width)
    trainer.init_state(b)
    step_fn = trainer._get_train_step(t, pretraining=False)
    obs = jax.device_put(b.observations, trainer._batch_sharded)
    acts = jax.device_put(b.actions, trainer._batch_sharded)
    args = (jnp.asarray(4, jnp.int32), jnp.asarray(0.9, jnp.float32))

    compile_start = time.perf_counter()
    state, metrics = step_fn(trainer.state, obs, acts, *args,
                             jax.random.PRNGKey(1), trainer.vgg_variables)
    warm_loss = float(metrics["loss"])
    compile_s = time.perf_counter() - compile_start

    step_s, loss = chained_step_time(step_fn, state, obs, acts, *args,
                                     vgg_variables=trainer.vgg_variables,
                                     steps=steps)
    assert np.isfinite(loss), "non-finite loss in tuning run"
    out = {"batch": batch, "remat": remat, "remat_policy": remat_policy,
            "subpixel": list(subpixel), "t": t, "px": height,
            "compile_s": round(compile_s, 1),
            "step_ms": round(step_s * 1000, 1),
            "frames_per_sec": round(batch * t / step_s, 1),
            "warm_loss": round(warm_loss, 3)}
    try:  # peak HBM shows what each checkpoint policy buys/costs
        stats = jax.local_devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in stats:
            out["peak_hbm_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        pass
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="8,16")
    parser.add_argument("--no-remat", action="store_true")
    parser.add_argument("--steps", type=int, default=6)
    parser.add_argument("--policies", default="full",
                        help="comma-separated remat policies to sweep "
                             "(full|dots|dots_no_batch), e.g. 'full,dots'")
    parser.add_argument("--subpixels", default="0-0-4",
                        help="comma-separated per-FinalBlock space-to-depth "
                             "factor triples, e.g. '0-0-0,0-0-4,4-4-4'")
    parser.add_argument("--tpu", default="",
                        help="extra tpu-config overrides for ablations, "
                             "e.g. 'fuse_upsample=0,stem_subpixel=0,"
                             "vgg_grad_subpixel=0,vgg_fast_pool_grad=0'")
    args = parser.parse_args()
    if args.steps < 1:
        raise SystemExit("--steps must be >= 1")

    subpixels = [tuple(int(d) for d in trip.split("-"))
                 for trip in args.subpixels.split(",") if trip.strip()]
    extra_tpu = {}
    for item in args.tpu.split(","):
        if item.strip():
            key, _, val = item.partition("=")
            val = val.strip()
            if val.lower() in ("true", "false"):  # 'false' must not stay a
                parsed = val.lower() == "true"    # truthy non-empty string
            elif val.lstrip("-").isdigit():
                parsed = int(val)
            else:
                parsed = val
            extra_tpu[key.strip()] = parsed
    for batch in [int(x) for x in args.batches.split(",")]:
        for policy in [p.strip() for p in args.policies.split(",") if p.strip()]:
            policy_arg = None if policy == "full" else policy
            for sp in subpixels:
                try:
                    out = measure(batch, remat=not args.no_remat,
                                  steps=args.steps, remat_policy=policy_arg,
                                  subpixel=sp, extra_tpu=extra_tpu)
                    if extra_tpu:
                        out["tpu_overrides"] = extra_tpu
                except Exception as e:  # OOM at large batch is a finding
                    out = {"batch": batch, "remat": not args.no_remat,
                           "remat_policy": policy_arg, "subpixel": list(sp),
                           "error": str(e)[:200]}
                print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
