"""Shared synthetic-workload harness for the throughput benches.

``bench.py``, ``tools/train_tune.py`` and ``tools/reference_train_bench.py``
all need the same scaffold — a synthetic config, a Caddy at matching
shape, a trainer with no real dataset behind it, a deterministic batch,
and a timed chain of dependent train steps ending in a host readback.
One implementation here so a timing-methodology fix lands everywhere
(the three copies had already drifted once).
"""
from __future__ import annotations

import time

import numpy as np


class NullDataset:
    """Trainer-facing stand-in when no real data is needed."""

    def set_observations_count(self, n):
        pass

    def __len__(self):
        return 0


def build_synthetic_trainer(*, height, width, batch_size, observations_count,
                            actions_count=7, observation_stacking=1,
                            hidden_state_size=128, state_features=64,
                            compute_dtype="bfloat16", remat=True,
                            remat_policy=None, rendering_subpixel=(0, 0, 4),
                            smooth_mi=True, output_root="/tmp/pvg_bench",
                            extra_tpu=None):
    """Trainer over a synthetic config at the given workload shape.

    ``smooth_mi=False`` selects the plain-MI trainer (what the reference
    tennis config uses, configs/03_tennis.yaml:66); the default matches
    the BAIR/breakout smooth-MI flavor (configs/01_bair.yaml:66)."""
    import jax.numpy as jnp

    from playablevideogeneration_tpu.config.configuration import Configuration
    from playablevideogeneration_tpu.data.synthetic import make_synthetic_config
    from playablevideogeneration_tpu.models.caddy import Caddy
    from playablevideogeneration_tpu.utils.logging import Logger

    config = make_synthetic_config(
        data_root="/nonexistent", output_root=output_root,
        height=height, width=width, actions_count=actions_count,
        batch_size=batch_size, observations_count=observations_count,
        observation_stacking=observation_stacking,
        hidden_state_size=hidden_state_size, state_features=state_features)
    config["tpu"] = {"compute_dtype": compute_dtype, "remat": remat,
                     "remat_policy": remat_policy,
                     "rendering_subpixel": tuple(rendering_subpixel)}
    # Ablation overrides for the MXU-layout optimizations (stem_subpixel,
    # fuse_upsample, vgg_grad_subpixel, vgg_fast_pool_grad, ...).
    extra_tpu = dict(extra_tpu or {})
    config["tpu"].update(extra_tpu)
    if not smooth_mi:
        config["training"] = dict(config["training"])
        config["training"]["trainer"] = "training.trainer"
    Configuration(config=config).check_config(check_data_root=False)

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    model = Caddy(actions_count=actions_count, action_space_dimension=2,
                  state_features=state_features,
                  state_resolution=(height // 8, width // 8),
                  hidden_state_size=hidden_state_size,
                  observation_stacking=observation_stacking,
                  remat=remat, remat_policy=remat_policy,
                  rendering_subpixel=tuple(rendering_subpixel),
                  rendering_subpixel_mode=extra_tpu.get(
                      "rendering_subpixel_mode", "strided"),
                  resize_impl=extra_tpu.get("resize_impl", "deconv"),
                  stem_subpixel=extra_tpu.get("stem_subpixel", 0),
                  fuse_upsample=extra_tpu.get("fuse_upsample", False),
                  dtype=dtype)
    if smooth_mi:
        from playablevideogeneration_tpu.training.smooth_mi import (
            make_smooth_mi_trainer as factory,
        )
    else:
        from playablevideogeneration_tpu.training.trainer import (
            make_trainer as factory,
        )
    return factory(config, model, NullDataset(), Logger())


def make_synthetic_batch(*, batch_size, observations_count, height, width,
                         actions_count=7, observation_stacking=1, seed=0):
    """Deterministic NHWC batch at the workload shape (stacked channels
    last, as the loader produces)."""
    from playablevideogeneration_tpu.data.video_dataset import Batch

    rng = np.random.default_rng(seed)
    channels = 3 * observation_stacking
    shape = (batch_size, observations_count, height, width, channels)
    return Batch(
        observations=rng.normal(size=shape).astype(np.float32) * 0.1,
        actions=rng.integers(0, actions_count,
                             size=(batch_size, observations_count))
        .astype(np.int32),
        rewards=np.zeros((batch_size, observations_count), np.float32),
        dones=np.zeros((batch_size, observations_count), bool),
        videos=[], initial_frames=[])


def chained_step_time(step, state, obs, acts, gt_init, gumbel_temperature,
                      vgg_variables, steps, seed=2):
    """Seconds/step over a chain of `steps` DEPENDENT train steps ending
    in a host readback: per-step block_until_ready can report
    async-dispatch time, not execution, on tunneled backends — the state
    dependency chain cannot lie.  Returns (seconds_per_step, last_loss);
    callers should assert the loss is finite."""
    import jax

    start = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, obs, acts, gt_init, gumbel_temperature,
                              jax.random.PRNGKey(seed + i), vgg_variables)
    loss = float(metrics["loss"])  # readback closes the dependency chain
    return (time.perf_counter() - start) / steps, loss
