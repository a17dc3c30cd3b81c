"""Benchmark: flagship-model throughput on one TPU chip.

Headline metric: scripted-rollout throughput at 256px on the BAIR-class
flagship model — N play steps (E -> R -> D, batch 1, bf16) fused into one
`lax.scan` device program emitting uint8 frames, one device->host transfer
(the reference's play.py rollout path, model.py:570-607; BASELINE.md
target: >= 30 frames/sec/chip).

Extra metrics (same JSON line, under "extra"):
- play_interactive_p50_latency_ms: per-frame latency of the interactive
  step with device-side uint8 conversion and double-buffered readback
  (frame N transfers while frame N+1 computes);
- train_frames_per_sec: training throughput on the BAIR-class workload
  (256px, per-chip batch 16 — the documented best layout, README sweep —
  T=12, bf16; reference workload configs/01_bair.yaml:105-117) —
  frames/sec trained on one chip.  Skipped if PVG_BENCH_TRAIN=0.
- play_step_device_ms / play_device_fps: link-independent per-step
  latency of the interactive play step (chained dispatches, one checksum
  readback) — the number that scores the 30 fps interactive target on
  the model rather than this host's tunneled link.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: repeat runs on this host skip the (slow,
# occasionally HTTP-500-flaky) remote TPU compiles entirely.  Set through
# jax.config, NOT env vars: axon's sitecustomize imports jax at
# interpreter startup, so env-var defaults are already captured before
# this module runs (an os.environ.setdefault here silently does nothing).
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_FPS = 30.0  # BASELINE.md north-star target
ROLLOUT_FRAMES = 64


def bench_readback_floor_ms() -> float:
    """p50 cost of one fresh-array device->host readback (256px uint8
    frame).  This is the hard floor under any interactive per-frame
    latency on this host: the model computes in well under 1 ms, so a
    p50 latency near this floor is link-bound, not compute-bound."""
    make = jax.jit(lambda k: (jax.random.uniform(k, (256, 256, 3)) * 255)
                   .astype(jnp.uint8))
    times = []
    for i in range(7):
        frame = make(jax.random.PRNGKey(i))
        jax.block_until_ready(frame)
        start = time.perf_counter()
        np.asarray(frame)
        times.append(time.perf_counter() - start)
    return float(np.percentile(times, 50)) * 1000.0


def bench_rollout(fn, args, streams: int = 4, sample_budget_s: float = 45.0):
    """Scripted rollout, measured two ways off ONE compiled program:

    - end-to-end fps: uint8 frames in `streams` chunks read back over
      concurrent host transfers (the device->host link sustains ~1.4x
      higher throughput with parallel streams than one large copy);
    - device-only fps: the same program's device-side checksum scalar is
      read back instead of the frames (a few bytes), so the timing proves
      full scan execution without paying the frame transfer — model
      regressions stay visible under the 2x run-to-run link noise.

    Returns (end_to_end_fps, device_only_fps)."""
    import concurrent.futures as cf

    variables, carry, window, action, variation = args
    chunk = ROLLOUT_FRAMES // streams

    def rollout(variables, carry, window, actions, variations):
        def body(c, x):
            carry, window = c
            a, v = x
            carry, frame, window = fn(variables, carry, window, a[None], v[None])
            u8 = ((jnp.clip(frame[0], -1.0, 1.0) + 1.0) * 127.5).astype(jnp.uint8)
            return (carry, window), u8

        (carry, window), frames = jax.lax.scan(
            body, (carry, window), (actions, variations))
        chunks = [frames[i * chunk:(i + 1) * chunk] for i in range(streams)]
        # Data-dependent on EVERY frame: reading this scalar forces the
        # whole scan to execute (block_until_ready does not block through
        # the tunnel; only host readbacks prove execution).
        checksum = frames.astype(jnp.int32).sum()
        return carry, window, chunks, checksum

    roll = jax.jit(rollout)
    actions = jnp.tile(action, (ROLLOUT_FRAMES, 1))
    variations = jnp.tile(variation, (ROLLOUT_FRAMES, 1))
    # Warm up / compile.
    c, w, chunks, checksum = roll(variables, carry, window, actions, variations)
    np.asarray(checksum)

    device_times = []
    for _ in range(5):
        start = time.perf_counter()
        c, w, _, checksum = roll(variables, carry, window, actions, variations)
        np.asarray(checksum)  # ~4-byte readback; no frame transfer
        device_times.append(time.perf_counter() - start)
    device_fps = ROLLOUT_FRAMES / float(np.percentile(device_times, 50))

    # The shared host link is the bottleneck and is noisy run-to-run
    # (observed 65-138 fps): take up to 9 samples under `sample_budget_s`
    # for a steadier median.  The caller shrinks the budget when earlier
    # stages ran long, so extra sampling can never starve the train bench
    # again (round 4 lost its train number to exactly that).
    times = []
    sampling_start = time.perf_counter()
    with cf.ThreadPoolExecutor(streams) as pool:
        for _ in range(9):
            start = time.perf_counter()
            c, w, chunks, _ = roll(variables, carry, window, actions, variations)
            frames = list(pool.map(np.asarray, chunks))  # concurrent D2H
            times.append(time.perf_counter() - start)
            if (len(times) >= 3
                    and time.perf_counter() - sampling_start > sample_budget_s):
                break
    assert sum(f.shape[0] for f in frames) == ROLLOUT_FRAMES
    return ROLLOUT_FRAMES / float(np.percentile(times, 50)), device_fps


def bench_interactive(fn, args):
    """Interactive per-frame latency off ONE compiled step program,
    measured two ways:

    - unpipelined p50: action in -> uint8 frame on host (dispatch +
      execution + device->host transfer, no overlap) — worst-case
      first-frame latency;
    - pipelined p50: the double-buffered loop a real UI runs
      (PlaySession.generate_next_u8(block=False),
      inference/play_session.py:99-107): step N+1 is dispatched BEFORE
      frame N is read back, so transfer overlaps compute and the
      steady-state per-frame period approaches max(compute, readback)
      — i.e. the link's readback floor;
    - device p50: the SAME step proven executed by a few-byte checksum
      readback instead of the frame — the number that answers "does the
      MODEL meet the <=33 ms interactive target?" independently of this
      host's tunneled link (the reference plays locally over PCIe,
      play.py:138-201, where readback is <1 ms).

    Returns (unpipelined_p50_ms, pipelined_p50_ms, device_p50_ms)."""
    variables, carry, window, action, variation = args

    def step_u8(variables, carry, window, action, variation):
        carry, frame, window = fn(variables, carry, window, action, variation)
        u8 = ((jnp.clip(frame, -1.0, 1.0) + 1.0) * 127.5).astype(jnp.uint8)
        return carry, u8, window

    step = jax.jit(step_u8, donate_argnums=(1, 2))
    carry, frame, window = step(variables, carry, window, action, variation)
    np.asarray(frame)

    latencies = []
    for _ in range(30):
        start = time.perf_counter()
        carry, frame, window = step(variables, carry, window, action, variation)
        np.asarray(frame)  # the user sees the frame only after readback
        latencies.append(time.perf_counter() - start)
    unpipelined = float(np.percentile(latencies, 50)) * 1000.0

    # Double-buffered: hold frame N on device, dispatch step N+1, THEN
    # read back frame N while N+1 computes.
    carry, prev, window = step(variables, carry, window, action, variation)
    periods = []
    for _ in range(30):
        start = time.perf_counter()
        carry, frame, window = step(variables, carry, window, action, variation)
        np.asarray(prev)  # frame N arrives while step N+1 computes
        prev = frame
        periods.append(time.perf_counter() - start)
    np.asarray(prev)  # drain the last in-flight frame
    pipelined = float(np.percentile(periods, 50)) * 1000.0

    # Device-side latency: the same per-step program, 30 data-DEPENDENT
    # dispatches chained through the carry with ONE few-byte checksum
    # readback at the end.  Dispatch is async, the carry dependence
    # serializes execution on the chip, and the single readback amortizes
    # the tunnel round-trip across all 30 steps — so total/30 is the
    # device-side per-step latency, free of this host's link.  (A
    # per-step scalar readback would re-pay the ~tens-of-ms tunnel RTT
    # every step and measure the link again.)
    def step_checksum(variables, carry, window, action, variation):
        carry, u8, window = step_u8(variables, carry, window, action, variation)
        return carry, u8.astype(jnp.int32).sum(), window

    cstep = jax.jit(step_checksum, donate_argnums=(1, 2))
    carry, checksum, window = cstep(variables, carry, window, action, variation)
    np.asarray(checksum)
    chains = []
    for _ in range(3):
        start = time.perf_counter()
        total = jnp.zeros((), jnp.int32)
        for _ in range(30):
            carry, checksum, window = cstep(variables, carry, window, action,
                                            variation)
            total = total + checksum
        np.asarray(total)  # one readback, data-dependent on every step
        chains.append((time.perf_counter() - start) / 30)
    device_ms = float(np.min(chains)) * 1000.0
    return unpipelined, pipelined, device_ms


def prepare_training_bench():
    """Builds + AOT-compiles the BAIR-class train step WITHOUT touching
    the chip, and returns a `finalize()` closure that does the first
    device work (state init, H2D upload, warm-up step) and returns the
    timed `run()` loop.

    Split this way so the (minutes-long) remote compile can run in a
    background thread overlapped with the TIMED rollout/interactive
    sections: compilation happens host-side + on the remote compile
    service, so it cannot pollute chip or link timings — only
    `finalize()` executes on the device, and main() calls it after the
    headline metrics are in.

    Per-chip batch 16 is this framework's documented best layout for the
    workload (README batch sweep: 8 -> 203 f/s, 16 -> 248.6 f/s); the
    reference's FULL global batch is 8, spread over 4x 2080 Ti
    (configs/01_bair.yaml:105-117 + README.md:125) — one chip here runs
    double that.  Remat over the time scan is what makes the 256px
    workload fit a 16G chip (34G activations otherwise)."""
    from playablevideogeneration_tpu.training.bench_harness import (
        build_synthetic_trainer,
        chained_step_time,
        make_synthetic_batch,
    )

    B, T, H, W = 16, 12, 256, 256
    trainer = build_synthetic_trainer(
        height=H, width=W, batch_size=B, observations_count=T,
        output_root="/tmp/pvg_bench_train")
    batch = make_synthetic_batch(batch_size=B, observations_count=T,
                                 height=H, width=W)

    step_fn = trainer._get_train_step(T, pretraining=False)

    # Lower with the EXACT shardings finalize() will place the real
    # arguments with (state via mesh.place_state, batch via the 'data'
    # axis, everything else replicated) — on one device they coincide
    # with unannotated avals, but on a multi-device mesh an executable
    # compiled for unsharded inputs would reject the placed state.
    from playablevideogeneration_tpu.parallel import mesh as mesh_lib

    replicated = mesh_lib.replicated_sharding(trainer.mesh)

    def aval(x, sharding=None):
        # Metadata only — no np.asarray(), which would read device
        # buffers back over the link.
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                    sharding=sharding or replicated)

    abstract = trainer.abstract_state(batch)
    abstract = jax.tree.map(
        aval, abstract,
        mesh_lib.state_shardings(trainer.mesh, abstract,
                                 trainer._tp_min_channels))
    compiled = step_fn.lower(
        abstract,
        jax.ShapeDtypeStruct((B, T, H, W, 3), jnp.float32,
                             sharding=trainer._batch_sharded),
        jax.ShapeDtypeStruct((B, T), jnp.int32,
                             sharding=trainer._batch_sharded),
        jax.ShapeDtypeStruct((), jnp.int32, sharding=replicated),
        jax.ShapeDtypeStruct((), jnp.float32, sharding=replicated),
        # legacy PRNGKey layout
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=replicated),
        jax.tree.map(aval, trainer.vgg_variables),
    ).compile()

    def finalize() -> "callable":
        trainer.init_state(batch)
        obs = jax.device_put(batch.observations, trainer._batch_sharded)
        acts = jax.device_put(batch.actions, trainer._batch_sharded)
        args = (jnp.asarray(4, jnp.int32), jnp.asarray(0.9, jnp.float32))

        state0, metrics = compiled(trainer.state, obs, acts, *args,
                                   jax.random.PRNGKey(1),
                                   trainer.vgg_variables)
        float(metrics["loss"])  # warm up; host readback forces execution

        def run() -> float:
            step_time, loss = chained_step_time(
                compiled, state0, obs, acts, *args,
                vgg_variables=trainer.vgg_variables, steps=10)
            assert np.isfinite(loss)
            return B * T / step_time

        return run

    return finalize


def main():
    import threading

    from __graft_entry__ import entry

    start = time.perf_counter()
    budget = float(os.environ.get("PVG_BENCH_BUDGET", "840"))
    result = {"metric": "play_rollout_fps_256px", "value": 0.0,
              "unit": "frames/sec/chip", "vs_baseline": 0.0, "extra": {}}
    done = threading.Event()
    lock = threading.Lock()  # guards result mutation vs watchdog dump

    def update(mapping, **kw):
        with lock:
            mapping.update(kw)

    def emit(final=False):
        # PROGRESSIVE emission: the line is re-printed as each metric
        # lands, so whatever tail the driver parses holds the most
        # complete snapshot measured by the time the process ends — an
        # external kill between stages can no longer lose earlier
        # metrics.  os._exit on the final line keeps a background thread
        # blocked inside a remote compile from aborting interpreter
        # teardown (observed: SIGABRT 'exception not rethrown').
        with lock:
            line = json.dumps(result)
        print(line, flush=True)
        if final:
            done.set()
            os._exit(0)

    # Watchdog THREAD (signals cannot preempt a long-running XLA compile;
    # a thread can): whatever is measured so far reaches the driver even
    # if a stage wedges past the budget.
    def watchdog():
        if not done.wait(timeout=budget + 90):
            update(result["extra"], watchdog_timeout=True)
            emit(final=True)

    threading.Thread(target=watchdog, daemon=True).start()

    stages = {}
    update(result["extra"], stage_s=stages)

    def timed(name, fn_, *a, **kw):
        t = time.perf_counter()
        out = fn_(*a, **kw)
        with lock:
            stages[name] = round(time.perf_counter() - t, 1)
        return out

    def remaining():
        return budget - (time.perf_counter() - start)

    # Remote TPU compiles are the budget's long pole (minutes each, and
    # the axon backend has no persistent executable cache), so the train
    # step AOT-compiles in a BACKGROUND thread from the very start —
    # compile work never touches the chip, so it cannot pollute the
    # timed rollout or interactive sections; the device-side finalize +
    # timed loop run later on a quiet chip.
    train_box = {}

    def train_prep():
        t = time.perf_counter()
        try:
            train_box["finalize"] = prepare_training_bench()
        except Exception as e:  # training bench must not sink the headline
            train_box["error"] = str(e)[:200]
        with lock:
            stages["train_prep"] = round(time.perf_counter() - t, 1)

    train_thread = None
    if os.environ.get("PVG_BENCH_TRAIN", "1") != "0":
        train_thread = threading.Thread(target=train_prep, daemon=True)
        train_thread.start()

    # First device contact pays for tunnel/device bring-up and can take
    # minutes on a cold flaky link — do it as its own attributed stage so
    # the cost never hides inside a measurement stage.
    timed("device_init",
          lambda: np.asarray(jax.jit(lambda: jnp.zeros((8,)))()))

    fn, args = timed("entry", entry)
    # On a bad-link day device_init + entry can eat most of the budget
    # (round 4: 731 s of 840); shrink the end-to-end sampling so the
    # train bench — the number this framework's perf work moves — still
    # fits.  ~330 s reserve = train finalize (~2 min) + timed loop +
    # interactive stage + margin.
    sample_budget = max(10.0, min(45.0, remaining() - 330.0))
    fps, device_fps = timed("rollout", bench_rollout, fn, args,
                            sample_budget_s=sample_budget)
    update(result, value=round(fps, 2), vs_baseline=round(fps / BASELINE_FPS, 3))
    # Device-only fps separates model speed from the ~2x run-to-run
    # noise of the shared device->host link.
    update(result["extra"], rollout_device_fps=round(device_fps, 2))
    emit()  # headline secured

    train_done = [False]

    def run_train_bench(reason_budget_s: float):
        """Train bench: the first device work (state init + H2D + warmup)
        then the timed chained loop.  Runs at most once."""
        if train_done[0] or train_thread is None:
            return
        train_done[0] = True
        try:
            if "finalize" in train_box and remaining() > reason_budget_s:
                run = timed("train_warmup", train_box["finalize"])
                update(result["extra"],
                       train_frames_per_sec=round(timed("train_run", run), 2),
                       train_batch_size=16)
            elif "error" in train_box:
                update(result["extra"], train_bench_error=train_box["error"])
            else:
                update(result["extra"], train_bench_skipped=(
                    f"budget: {remaining():.0f}s left, "
                    f"compile done: {'finalize' in train_box}"))
        except Exception as e:  # a flaky train step must not sink the
            update(result["extra"],  # already-measured headline metrics
                   train_bench_error=str(e)[:200])
        emit()

    # TRAIN BENCH RUNS DIRECTLY AFTER THE HEADLINE when its background
    # compile is already done (round 4 lost the train number by ordering
    # the cheap-on-paper interactive stages first and hitting the budget
    # wall).  If the compile is still running, the interactive stages
    # below overlap with it instead of idling.
    if "finalize" in train_box or "error" in train_box:
        run_train_bench(reason_budget_s=120)

    # The readback floor contextualizes the interactive p50: ~35 ms of
    # every per-frame latency on this host is the device->host link, not
    # the model (compute is ~2.8 ms; see README.md performance notes).
    update(result["extra"], readback_floor_ms=round(
        timed("readback_floor", bench_readback_floor_ms), 2))

    # Interactive p50 costs one small compile + ~60 x 40 ms of steps —
    # always worth the time now that the headline is already out.  The
    # pipelined number is what a double-buffered UI sees (expected ~= the
    # readback floor); the unpipelined one is worst-case single-frame;
    # play_step_device_ms is the link-independent per-step latency that
    # scores the <=33 ms / 30 fps interactive target on the MODEL.
    p50, p50_pipelined, device_ms = timed("interactive", bench_interactive,
                                          fn, args)
    update(result["extra"],
           play_interactive_p50_latency_ms=round(p50, 2),
           play_pipelined_p50_latency_ms=round(p50_pipelined, 2),
           play_pipelined_effective_fps=round(1000.0 / p50_pipelined, 2),
           play_step_device_ms=round(device_ms, 2),
           play_device_fps=round(1000.0 / device_ms, 2))
    emit()

    if not train_done[0] and train_thread is not None:
        train_thread.join(timeout=max(remaining() - 60, 0))
        # The finalize is real device work (state init + H2D upload +
        # warm-up step) — on a slow tunnel day it needs ~2 min; with
        # less than that left, an explicit skip marker beats a watchdog
        # truncation.
        run_train_bench(reason_budget_s=120)

    emit(final=True)


if __name__ == "__main__":
    main()
