"""Benchmark: interactive rollout throughput on the flagship model.

Measures the per-frame play-step latency (E -> R -> D, batch 1, 256px,
bf16) on one chip — the reference's play.py per-frame path
(reference play.py:138-201, model.py:570-607) and the headline metric in
BASELINE.md (target: >= 30 frames/sec/chip at 256px).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 30.0  # BASELINE.md north-star target


def main():
    from __graft_entry__ import entry

    fn, args = entry()
    step = jax.jit(fn, donate_argnums=(1, 2))

    variables, carry, window, action, variation = args
    # Warm up / compile.
    carry, frame, window = step(variables, carry, window, action, variation)
    jax.block_until_ready(frame)

    latencies = []
    frames = 0
    for _ in range(50):
        start = time.perf_counter()
        carry, frame, window = step(variables, carry, window, action, variation)
        np.asarray(frame)  # device -> host readback, as in interactive play
        latencies.append(time.perf_counter() - start)
        frames += 1

    p50 = float(np.percentile(latencies, 50))
    fps = 1.0 / p50
    print(json.dumps({
        "metric": "play_rollout_fps_256px",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
