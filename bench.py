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
  (256px, batch 8, T=12, bf16; reference configs/01_bair.yaml:105-117) —
  frames/sec trained on one chip.  Skipped if PVG_BENCH_TRAIN=0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import os
import time

# Persistent compile cache: repeat runs on this host skip the (slow,
# occasionally HTTP-500-flaky) remote TPU compiles entirely.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

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


def bench_rollout(fn, args, streams: int = 4):
    """Scripted rollout: one scan program emitting uint8 frames in
    `streams` chunks, read back over concurrent host transfers (the
    device->host link sustains ~1.4x higher throughput with parallel
    streams than with one large copy)."""
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
        return carry, window, chunks

    roll = jax.jit(rollout)
    actions = jnp.tile(action, (ROLLOUT_FRAMES, 1))
    variations = jnp.tile(variation, (ROLLOUT_FRAMES, 1))
    # Warm up / compile.
    c, w, chunks = roll(variables, carry, window, actions, variations)
    jax.block_until_ready(chunks)

    # The shared host link is the bottleneck and is noisy run-to-run;
    # 5 samples give a usable median while leaving budget for the
    # secondary metrics (round 2 spent it all on 9 samples + compiles).
    times = []
    with cf.ThreadPoolExecutor(streams) as pool:
        for _ in range(5):
            start = time.perf_counter()
            c, w, chunks = roll(variables, carry, window, actions, variations)
            frames = list(pool.map(np.asarray, chunks))  # concurrent D2H
            times.append(time.perf_counter() - start)
    assert sum(f.shape[0] for f in frames) == ROLLOUT_FRAMES
    return ROLLOUT_FRAMES / float(np.percentile(times, 50))


def bench_interactive(fn, args):
    """Interactive per-frame p50 latency: action in -> uint8 frame on host
    (step dispatch + execution + device->host transfer, no overlap)."""
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
    return float(np.percentile(latencies, 50)) * 1000.0


def prepare_training_bench():
    """Builds + compiles the BAIR-class train step and returns a zero-arg
    closure that runs the timed loop (frames/sec trained, one chip).

    Split so the (minutes-long) remote compile can run in a background
    thread overlapped with the rollout compile; the timed loop runs later
    on a quiet chip.

    Per-chip batch 8 is the reference's FULL global batch — the workload
    it spreads over 4x 2080 Ti (configs/01_bair.yaml:105-117 +
    README.md:125) runs on one chip here.  Remat over the time scan is
    what makes the 256px workload fit a 16G chip (34G activations
    otherwise)."""
    from playablevideogeneration_tpu.config.configuration import Configuration
    from playablevideogeneration_tpu.data.synthetic import make_synthetic_config
    from playablevideogeneration_tpu.data.video_dataset import Batch
    from playablevideogeneration_tpu.models.caddy import Caddy
    from playablevideogeneration_tpu.training.smooth_mi import make_smooth_mi_trainer
    from playablevideogeneration_tpu.utils.logging import Logger

    B, T, H, W = 8, 12, 256, 256
    config = make_synthetic_config(
        data_root="/nonexistent", output_root="/tmp/pvg_bench_train",
        height=H, width=W, actions_count=7, batch_size=B,
        observations_count=T, observation_stacking=1,
        hidden_state_size=128, state_features=64)
    config["tpu"] = {"compute_dtype": "bfloat16", "remat": True}
    Configuration(config=config).check_config(check_data_root=False)

    model = Caddy(actions_count=7, action_space_dimension=2, state_features=64,
                  state_resolution=(H // 8, W // 8), hidden_state_size=128,
                  observation_stacking=1, remat=True, dtype=jnp.bfloat16)

    class _NullDataset:
        def set_observations_count(self, n):
            pass

        def __len__(self):
            return 0

    trainer = make_smooth_mi_trainer(config, model, _NullDataset(), Logger())
    rng = np.random.default_rng(0)
    batch = Batch(
        observations=rng.normal(size=(B, T, H, W, 3)).astype(np.float32) * 0.1,
        actions=rng.integers(0, 7, size=(B, T)).astype(np.int32),
        rewards=np.zeros((B, T), np.float32), dones=np.zeros((B, T), bool),
        videos=[], initial_frames=[])
    trainer.init_state(batch)

    step_fn = trainer._get_train_step(T, pretraining=False)
    obs = jax.device_put(batch.observations, trainer._batch_sharded)
    acts = jax.device_put(batch.actions, trainer._batch_sharded)
    args = (jnp.asarray(4, jnp.int32), jnp.asarray(0.9, jnp.float32))

    state0, metrics = step_fn(trainer.state, obs, acts, *args,
                              jax.random.PRNGKey(1), trainer.vgg_variables)
    float(metrics["loss"])  # warm up; host readback forces execution

    def run() -> float:
        # Time a CHAIN of steps ending in a host readback: per-step
        # block_until_ready can report async-dispatch time, not execution,
        # on tunneled backends — the state dependency chain cannot lie.
        state = state0
        n = 10
        start = time.perf_counter()
        for i in range(n):
            state, metrics = step_fn(state, obs, acts, *args,
                                     jax.random.PRNGKey(2 + i),
                                     trainer.vgg_variables)
        assert np.isfinite(float(metrics["loss"]))
        step_time = (time.perf_counter() - start) / n
        return B * T / step_time

    return run


def main():
    import threading

    from __graft_entry__ import entry

    start = time.perf_counter()
    budget = float(os.environ.get("PVG_BENCH_BUDGET", "480"))
    result = {"metric": "play_rollout_fps_256px", "value": 0.0,
              "unit": "frames/sec/chip", "vs_baseline": 0.0, "extra": {}}
    emitted = threading.Event()
    lock = threading.Lock()  # guards result mutation vs watchdog dump

    def update(mapping, **kw):
        with lock:
            mapping.update(kw)

    def emit():
        with lock:
            if emitted.is_set():
                return
            line = json.dumps(result)
            emitted.set()
        print(line, flush=True)

    # Watchdog THREAD (signals cannot preempt a long-running XLA compile;
    # a thread can): whatever is measured so far reaches the driver even
    # if an external timeout kills the process mid-compile.
    def watchdog():
        if not emitted.wait(timeout=budget + 90):
            emit()

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

    # The readback floor contextualizes the interactive p50: ~35 ms of
    # every per-frame latency on this host is the device->host link, not
    # the model (compute is ~0.33 ms; see README.md performance notes).
    update(result["extra"], readback_floor_ms=round(
        timed("readback_floor", bench_readback_floor_ms), 2))

    fn, args = timed("entry", entry)

    # Remote TPU compiles are the budget's long pole (minutes each, and
    # the axon backend has no persistent executable cache), so the train
    # step compiles in a BACKGROUND thread overlapped with the rollout
    # compile; its timed loop runs later on a quiet chip.
    train_box = {}

    def train_prep():
        t = time.perf_counter()
        try:
            train_box["run"] = prepare_training_bench()
        except Exception as e:  # training bench must not sink the headline
            train_box["error"] = str(e)[:200]
        with lock:
            stages["train_prep"] = round(time.perf_counter() - t, 1)

    train_thread = None
    if os.environ.get("PVG_BENCH_TRAIN", "1") != "0":
        train_thread = threading.Thread(target=train_prep, daemon=True)
        train_thread.start()

    fps = timed("rollout", bench_rollout, fn, args)
    update(result, value=round(fps, 2), vs_baseline=round(fps / BASELINE_FPS, 3))

    # Interactive p50 costs one small compile + ~30 x 40 ms of steps.
    if remaining() > 25:
        update(result["extra"], play_interactive_p50_latency_ms=round(
            timed("interactive", bench_interactive, fn, args), 2))

    if train_thread is not None:
        train_thread.join(timeout=max(remaining() - 45, 0))
        if "run" in train_box and remaining() > 30:
            update(result["extra"], train_frames_per_sec=round(
                timed("train_run", train_box["run"]), 2))
        elif "error" in train_box:
            update(result["extra"], train_bench_error=train_box["error"])
        else:
            update(result["extra"], train_bench_skipped=(
                f"budget: {remaining():.0f}s left, "
                f"compile done: {'run' in train_box}"))

    emit()


if __name__ == "__main__":
    main()
