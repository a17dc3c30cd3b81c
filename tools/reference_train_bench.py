"""Measured denominator for the training-throughput target.

BASELINE.md's ">= 5x reference-GPU throughput on v5e-8" target had no
reference-side measurement.  This tool produces one on the only hardware
both frameworks can run on here (the host CPU): it executes the ACTUAL
reference trainer step — `Trainer.compute_losses` + backward + Adam step
(/root/reference/training/trainer.py:400-550,577-587) with the real
reference model and all seven loss terms — against this framework's
jitted train step at identical shapes, batch content, and a random-weight
VGG19 on both sides.

The reference's torchvision/wandb/piq dependencies are absent in this
environment, so the bench stubs exactly what the reference would
download/log: a hand-built torch VGG19 (same architecture as
model/layers/vgg.py:15-56, random weights) and a no-op wandb module.
`.cuda()` is patched to a no-op (the reference hard-codes it,
trainer.py:289-291).

Usage:
    python tools/reference_train_bench.py [--size 32] [--batch 2] [--t 4]
        [--steps 5] [--skip-mine]

Prints one JSON line with both step times; record the numbers in
BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def patch_environment():
    """No-op .cuda(), stub wandb, make the reference importable."""
    import collections
    import collections.abc

    import torch

    # The reference targets python 3.7 (env.yml:81); collections.Sequence
    # moved to collections.abc in 3.10 (used at trainer.py:179).
    if not hasattr(collections, "Sequence"):
        collections.Sequence = collections.abc.Sequence

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    wandb = types.ModuleType("wandb")
    wandb.init = wandb.log = wandb.watch = lambda *a, **k: None
    sys.modules.setdefault("wandb", wandb)
    # torchvision is only touched inside the reference Vgg19.__init__
    # (model/layers/vgg.py:4,16), which this bench replaces wholesale; an
    # import-time stub is enough.
    torchvision = types.ModuleType("torchvision")
    for sub in ("models", "transforms"):
        mod = types.ModuleType(f"torchvision.{sub}")
        setattr(torchvision, sub, mod)
        sys.modules.setdefault(f"torchvision.{sub}", mod)
    sys.modules.setdefault("torchvision", torchvision)
    sys.path.insert(0, REFERENCE)


def build_torch_vgg19():
    """torchvision-free clone of the reference Vgg19 feature extractor
    (model/layers/vgg.py:15-56): torchvision vgg19 `features` layers 0-29,
    random weights, split into the same 5 slices."""
    import torch.nn as nn

    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512]
    layers, in_ch = [], 3
    for item in plan:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.extend([nn.Conv2d(in_ch, item, 3, padding=1),
                           nn.ReLU(inplace=True)])
            in_ch = item
    features = nn.Sequential(*layers)

    class Vgg19(nn.Module):
        def __init__(self, requires_grad=False):
            super().__init__()
            bounds = [(0, 2), (2, 7), (7, 12), (12, 21), (21, 30)]
            for i, (lo, hi) in enumerate(bounds):
                setattr(self, f"slice{i + 1}",
                        nn.Sequential(*[features[x] for x in range(lo, hi)]))
            if not requires_grad:
                for p in self.parameters():
                    p.requires_grad = False

        def forward(self, x):
            out = []
            for i in range(5):
                x = getattr(self, f"slice{i + 1}")(x)
                out.append(x)
            return out

    return Vgg19


def make_config(size, batch, t, stacking=1):
    from playablevideogeneration_tpu.data.synthetic import make_synthetic_config

    cfg = make_synthetic_config(
        data_root="/x", output_root="/tmp/ref_bench", height=size, width=size,
        actions_count=3, batch_size=batch, observations_count=t,
        observation_stacking=stacking, hidden_state_size=128,
        state_features=64)
    cfg["model"]["architecture"] = "model.main_model.model"
    cfg["model"]["action_network"]["use_variations"] = True
    # Keys the reference Trainer reads directly (its Configuration would
    # default them, utils/configuration.py:46-93).
    cfg["training"]["use_motion_weights"] = False
    cfg["training"]["motion_weights_bias"] = 1.0
    cfg["training"]["action_mutual_information_entropy_lambda"] = 1.0
    return cfg


def make_batch_arrays(cfg, size, batch, t, stacking, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    obs = rng.normal(size=(batch, t, 3 * stacking, size, size)).astype(
        np.float32) * 0.1
    actions = rng.integers(0, 3, size=(batch, t)).astype(np.int64)
    return obs, actions


def bench_reference(cfg, size, batch, t, stacking, steps):
    import torch

    import importlib

    # CPU-safe noise/sampling (the reference hard-codes .cuda() inside,
    # model.py:496 and action_network.py:45 — same patch as the parity
    # suite, tests/test_reference_parity.py).
    action_module = importlib.import_module("model.main_model.action_network")

    def cpu_sample(self, mean, variance):
        noise = torch.randn(mean.size(), dtype=torch.float32)
        return noise * torch.sqrt(variance) + mean

    action_module.ActionNetwork.sample = cpu_sample
    main_module = importlib.import_module("model.main_model.model")
    main_module.Model.generate_noise = lambda self, bs: torch.zeros(
        (bs, self.random_noise_size))

    import training.losses as ref_losses

    ref_losses.Vgg19 = build_torch_vgg19()

    from dataset.batching import Batch
    from training.trainer import Trainer

    torch.manual_seed(0)
    model = main_module.Model(cfg)
    model.train()

    class _Dummy(torch.utils.data.Dataset):
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return None

    trainer = Trainer(cfg, model, _Dummy(), logger=None)
    # Step 0 would trigger the TSNE plotting branch (trainer.py:543-548,
    # `global_step % freq == 0`); benchmark steady-state steps instead.
    trainer.global_step = 1
    model_dp = torch.nn.DataParallel(model)  # train.py:67 (CPU fallback)

    obs, actions = make_batch_arrays(cfg, size, batch, t, stacking)
    b = Batch(torch.from_numpy(obs), torch.from_numpy(actions),
              torch.zeros((batch, t)), torch.zeros((batch, t)), [], [])

    def step():
        total_loss, *_ = trainer.compute_losses(model_dp, b, t)
        trainer.optimizer.zero_grad()
        total_loss.backward()
        trainer.optimizer.step()
        trainer.lr_scheduler.step()
        return float(total_loss)

    step()  # warm-up (allocator, autograd graph shapes)
    start = time.perf_counter()
    for _ in range(steps):
        loss = step()
    elapsed = (time.perf_counter() - start) / steps
    assert loss == loss, "reference loss is NaN"
    return elapsed


def bench_mine(cfg, size, batch, t, stacking, steps):
    # Honor PVG_PLATFORM (the axon sitecustomize pins JAX_PLATFORMS to the
    # tunneled TPU; without this the "CPU" comparison silently runs on the
    # chip — 65x "speedups" were measured before this line existed).
    from playablevideogeneration_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from playablevideogeneration_tpu.data.video_dataset import Batch
    from playablevideogeneration_tpu.training.bench_harness import (
        build_synthetic_trainer,
        chained_step_time,
    )

    # Plain-MI trainer, f32, no remat — matching the reference defaults
    # the torch side runs with (smooth_mi=False mirrors
    # configs/03_tennis.yaml:66; the config keys derive from the same
    # make_synthetic_config the torch side's cfg came from).
    trainer = build_synthetic_trainer(
        height=size, width=size, batch_size=batch, observations_count=t,
        actions_count=3, observation_stacking=stacking,
        compute_dtype="float32", remat=False, smooth_mi=False,
        output_root="/tmp/ref_bench")
    obs, actions = make_batch_arrays(cfg, size, batch, t, stacking)
    # NHWC with stacked channels last, as the loader produces — the SAME
    # array content the torch side consumed in NCHW.
    obs_nhwc = np.moveaxis(obs, 2, -1)
    b = Batch(observations=obs_nhwc, actions=actions.astype(np.int32),
              rewards=np.zeros((batch, t), np.float32),
              dones=np.zeros((batch, t), bool), videos=[], initial_frames=[])
    trainer.init_state(b)
    step_fn = trainer._get_train_step(t, pretraining=False)
    o = jnp.asarray(obs_nhwc)
    a = jnp.asarray(actions.astype(np.int32))
    args = (jnp.asarray(2, jnp.int32), jnp.asarray(0.9, jnp.float32))

    state, metrics = step_fn(trainer.state, o, a, *args,
                             jax.random.PRNGKey(1), trainer.vgg_variables)
    float(metrics["loss"])  # compile + warm-up

    elapsed, loss = chained_step_time(step_fn, state, o, a, *args,
                                      vgg_variables=trainer.vgg_variables,
                                      steps=steps)
    assert np.isfinite(loss)
    return elapsed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=32)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--t", type=int, default=4)
    parser.add_argument("--stacking", type=int, default=1)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--skip-mine", action="store_true")
    args = parser.parse_args()
    if args.steps < 1:
        raise SystemExit("--steps must be >= 1")

    # FORCE cpu (not setdefault): an inherited PVG_PLATFORM=tpu would
    # silently produce the bogus cross-device "speedup" this tool exists
    # to avoid; the JSON also records the backend actually used.
    os.environ["PVG_PLATFORM"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_compilation_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    patch_environment()
    cfg = make_config(args.size, args.batch, args.t, args.stacking)

    frames = args.batch * args.t
    out = {"config": {"size": args.size, "batch": args.batch, "t": args.t},
           "host": "cpu"}
    ref_s = bench_reference(cfg, args.size, args.batch, args.t,
                            args.stacking, args.steps)
    out["reference_step_s"] = round(ref_s, 4)
    out["reference_frames_per_sec"] = round(frames / ref_s, 2)
    if not args.skip_mine:
        mine_s = bench_mine(cfg, args.size, args.batch, args.t,
                            args.stacking, args.steps)
        import jax

        out["jax_backend"] = jax.default_backend()
        assert out["jax_backend"] == "cpu", "JAX side escaped to the chip"
        out["tpu_framework_step_s"] = round(mine_s, 4)
        out["tpu_framework_frames_per_sec"] = round(frames / mine_s, 2)
        out["speedup_same_cpu"] = round(ref_s / mine_s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
