"""Trainer: jitted, data-parallel training step + host orchestration.

Reference: training/trainer.py:25-613.  The torch trainer's per-step work
(forward, 7-term weighted loss, backward, Adam, LR schedule, EMA state
updates) is fused into one jitted `train_step` compiled per
(sequence_length, phase) pair; the three annealing schedules
(trainer.py:124-165) are computed on host and the first two enter the
compiled program as traced scalars (no recompilation).  Data parallelism
is batch-axis sharding over the ICI mesh (replacing nn.DataParallel,
train.py:67); XLA inserts the gradient and EMA-statistics all-reduces.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from playablevideogeneration_tpu.data.loader import DataLoader
from playablevideogeneration_tpu.models import vgg as vgg_lib
from playablevideogeneration_tpu.models.caddy import Caddy, init_model_variables
from playablevideogeneration_tpu.models.centroids import average_centroid_distance
from playablevideogeneration_tpu.parallel import mesh as mesh_lib
from playablevideogeneration_tpu.training import losses, schedules
from playablevideogeneration_tpu.training.train_state import TrainState
from playablevideogeneration_tpu.utils import checkpoint as ckpt_lib
from playablevideogeneration_tpu.utils.logging import AverageMeter, Logger


def compute_loss_terms(
    model: Caddy,
    variables: Dict[str, Any],
    observations: jnp.ndarray,
    actions: jnp.ndarray,
    gt_init: jnp.ndarray,
    gumbel_temperature: jnp.ndarray,
    sample_rng: jax.Array,
    vgg_apply,
    loss_weights: Dict[str, float],
    mi_lambda: float,
    pretraining: bool,
    use_motion_weights: bool,
    motion_weights_bias: float,
    mi_matrix: Optional[jnp.ndarray],
    mi_alpha: Optional[float],
    vgg_batched_gt: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Forward + all loss terms (reference trainer.py:241-550).

    Returns (total_loss, aux) where aux carries mutated collections, the
    new MI matrix, and the diagnostic scalars.
    """
    out, mutated = model.apply(
        variables, observations, actions, gt_init,
        pretraining=pretraining, gumbel_temperature=gumbel_temperature,
        train=True, mutable=["batch_stats", "model_state"],
        rngs={"sample": sample_rng})

    suffix = "_pretraining" if pretraining else ""
    w = loss_weights

    weight_mask = None
    if use_motion_weights:
        weight_mask = losses.motion_weight_mask(
            observations, out.reconstructed_observations, motion_weights_bias)

    # Reconstruction + perceptual averaged over decoder resolutions
    # (reference trainer.py:445-466).
    resolutions = out.multiresolution_reconstructed_observations
    perceptual_total = jnp.zeros(())
    obs_rec_total = jnp.zeros(())
    info: Dict[str, Any] = {}
    for r_idx, recon in enumerate(resolutions):
        p_total, p_levels = losses.perceptual_loss(
            vgg_apply, observations, recon, weight_mask,
            batched_gt=vgg_batched_gt)
        o_loss = losses.observations_loss(observations, recon, weight_mask)
        perceptual_total = perceptual_total + p_total
        obs_rec_total = obs_rec_total + o_loss
        info[f"perceptual_loss_r{r_idx}"] = p_total
        info[f"observations_rec_loss_r{r_idx}"] = o_loss
        for l_idx, level in enumerate(p_levels):
            info[f"perceptual_loss_r{r_idx}_l{l_idx}"] = level
    n_res = float(len(resolutions))
    perceptual_loss = perceptual_total / n_res
    obs_rec_loss = obs_rec_total / n_res
    perceptual_term = w[f"perceptual_loss_lambda{suffix}"] * perceptual_loss

    states_rec_loss = losses.states_loss(
        jax.lax.stop_gradient(out.states), out.reconstructed_states)
    entropy_loss = losses.entropy_logits(out.action_logits)
    directions_kl = losses.kl_gaussian_divergence(out.action_directions_distribution)
    # The reconstructed action-state distribution chases the true one, not
    # vice versa (reference trainer.py:319,474).
    action_state_kl = losses.kl_general_gaussian_divergence(
        out.reconstructed_action_states_distribution,
        jax.lax.stop_gradient(out.action_states_distribution))

    p_real = jax.nn.softmax(out.action_logits, axis=-1)
    p_recon = jax.nn.softmax(out.reconstructed_action_logits, axis=-1)
    if mi_matrix is not None:
        mi_loss, new_mi_matrix = losses.smooth_mutual_information_loss(
            p_real, p_recon, mi_matrix, mi_alpha, lamb=mi_lambda)
    else:
        mi_loss = losses.mutual_information_loss(p_real, p_recon, lamb=mi_lambda)
        new_mi_matrix = None

    total = (
        w[f"reconstruction_loss_lambda{suffix}"] * obs_rec_loss
        + perceptual_term
        + w[f"states_rec_lambda{suffix}"] * states_rec_loss
        + w[f"entropy_lambda{suffix}"] * entropy_loss
        + w[f"action_directions_kl_lambda{suffix}"] * directions_kl
        + w[f"action_mutual_information_lambda{suffix}"] * mi_loss
        + w[f"action_state_distribution_kl_lambda{suffix}"] * action_state_kl
    )

    if pretraining:
        # Gradient must not flow from the dynamics hidden states into the
        # representation network through the projection target
        # (reference trainer.py:313).
        hidden_rec_loss = losses.hidden_states_loss(
            out.hidden_states,
            jax.lax.stop_gradient(out.reconstructed_hidden_states))
        total = total + w["hidden_states_rec_lambda_pretraining"] * hidden_rec_loss
        info["hidden_states_rec_loss"] = hidden_rec_loss

    # Diagnostics (reference trainer.py:477-535); all cheap scalars.
    centroids = mutated["model_state"]["centroids"]
    diag = dict(
        avg_observations_rec_loss=obs_rec_loss,
        avg_perceptual_loss=perceptual_loss,
        loss_component_perceptual_loss=perceptual_term,
        states_rec_loss=states_rec_loss,
        entropy_loss=entropy_loss,
        samples_entropy=losses.entropy_probabilities(out.action_samples),
        action_distribution_entropy=losses.entropy_probabilities(
            out.action_samples.mean(axis=(0, 1))[None]),
        states_magnitude=jnp.mean(jnp.abs(out.states)),
        hidden_states_magnitude=jnp.mean(jnp.abs(out.hidden_states)),
        action_directions_mean_magnitude=jnp.mean(
            jnp.abs(out.action_directions_distribution[:, :, 0])),
        action_directions_variance_magnitude=jnp.mean(
            jnp.abs(out.action_directions_distribution[:, :, 1])),
        action_directions_reconstruction_error=jnp.mean(
            (out.reconstructed_action_directions_distribution[:, :, 0]
             - out.action_directions_distribution[:, :, 0]) ** 2),
        action_directions_kl_loss=directions_kl,
        centroids_mean_magnitude=jnp.mean(jnp.abs(centroids)),
        average_centroids_distance=average_centroid_distance(centroids),
        average_action_variations_norm_l2=jnp.mean(
            jnp.sqrt(jnp.sum(out.action_variations**2, axis=-1) + 1e-12)),
        action_variations_mean=jnp.mean(out.action_variations),
        action_mutual_information_loss=mi_loss,
        action_state_distribution_kl_loss=action_state_kl,
        # Categorical KL between the reconstructed and the real action
        # distributions.  The reference constructs this loss
        # (trainer.py:48, losses.py:121) but never weights it into the
        # total; surfaced here as a pure diagnostic.
        actions_kl_divergence=losses.kl_divergence_categorical(
            out.reconstructed_action_logits, out.action_logits),
    )
    diag = {k: jax.lax.stop_gradient(v) for k, v in diag.items()}
    info.update(diag)

    # Arrays for the action-space plots (reference trainer.py:543-548);
    # a few KB, returned from every step (a dedicated plot-step program
    # would recompile the whole train step).
    plot_arrays = jax.lax.stop_gradient(dict(
        action_directions_distribution=out.action_directions_distribution,
        action_probabilities=p_real,
        action_states_distribution=out.action_states_distribution,
        centroids=centroids,
    ))

    aux = dict(mutated=mutated, new_mi_matrix=new_mi_matrix, info=info,
               plot_arrays=plot_arrays)
    return total, aux


class Trainer:
    """Host-side training orchestration (reference trainer.py:25-613)."""

    def __init__(self, config, model: Caddy, dataset, logger: Logger,
                 smooth_mi: bool = False, mesh=None, vgg_variables=None):
        self.config = config
        self.model = model
        self.dataset = dataset
        self.logger = logger
        self.smooth_mi = smooth_mi
        self.global_step = 0

        t = config["training"]
        self.tx, self.lr_schedule = schedules.make_optimizer(config)
        if mesh is None:
            # tpu.model_parallel > 1 activates tensor-parallel sharding of
            # wide kernels over the 'model' mesh axis (parallel/mesh.py);
            # tpu.data_parallel_devices caps the mesh to the first
            # N * model_parallel devices (None = all).
            tpu_cfg = config.get("tpu", {})
            model_parallel = tpu_cfg.get("model_parallel", 1)
            dp_devices = tpu_cfg.get("data_parallel_devices")
            devices = None
            if dp_devices is not None:
                devices = jax.devices()[: dp_devices * model_parallel]
            mesh = mesh_lib.make_mesh(devices, model_parallel=model_parallel)
        self.mesh = mesh
        self._tp_min_channels = config.get("tpu", {}).get("tp_min_channels", 256)
        # wandb.watch equivalent (reference train.py:70): per-subnetwork
        # gradient histograms, computed DEVICE-side (64 bins + edges per
        # module, a few hundred bytes) so no gradient tensor crosses the
        # link.  Off by default: scalar grad norms stay always-on.
        self._grad_histograms = config.get("tpu", {}).get(
            "grad_histograms", False)
        # TP x multi-host states checkpoint via orbax sharded save/restore
        # (utils/checkpoint.py): every process writes/reads only its own
        # shards, so no NotImplementedError guard is needed here anymore.
        self._replicated = mesh_lib.replicated_sharding(self.mesh)
        self._batch_sharded = NamedSharding(self.mesh, P(mesh_lib.DATA_AXIS))

        if vgg_variables is None:
            from playablevideogeneration_tpu.utils import pretrained

            vgg_variables, vgg_pretrained = pretrained.get_vgg_variables(
                config, logger)
            if not vgg_pretrained:
                self.logger.print(
                    "[trainer] WARNING: no pretrained VGG weights provided; "
                    "perceptual loss uses random VGG19 features "
                    "(see docs/PRETRAINED_WEIGHTS.md)")
        # VGG params are threaded through the jitted step as an ARGUMENT:
        # closure capture would bake ~MBs of weights into the lowered module
        # as inline constants (pathological lowering time).
        self.vgg_variables = mesh_lib.replicate(self.mesh, vgg_variables)

        self.dataloader = DataLoader(
            dataset,
            batch_size=t["batching"]["batch_size"],
            shuffle=True,
            drop_last=True,
            num_workers=t["batching"]["num_workers"],
            prefetch=config.get("tpu", {}).get("prefetch_batches", 2),
            worker_mode=t["batching"].get("worker_mode", "thread"),
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )

        self._rng = jax.random.PRNGKey(config.get("seed", 0))
        self._jitted: Dict[Tuple[int, bool], Any] = {}
        self.average_meter = AverageMeter()
        self.state: Optional[TrainState] = None
        # jax.profiler trace window (SURVEY.md §5 tracing): set
        # tpu.profile_dir (or PVG_PROFILE_DIR) to capture a 5-step window
        # after warmup of the first profiled epoch.
        self.profile_dir = (config.get("tpu", {}).get("profile_dir")
                            or os.environ.get("PVG_PROFILE_DIR"))
        self._profiling = False
        self._profile_stop_at = 0

    # ------------------------------------------------------------------ #
    # State init / checkpointing                                          #
    # ------------------------------------------------------------------ #

    def _build_state(self, rng, observations, actions) -> TrainState:
        variables = init_model_variables(self.model, rng, observations, actions)
        params = variables["params"]
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            batch_stats=variables.get("batch_stats", {}),
            model_state=variables.get("model_state", {}),
            mi_matrix=losses.init_mi_matrix(self.config["data"]["actions_count"]),
            step=jnp.zeros((), jnp.int32),
        )

    def init_state(self, sample_batch,
                   host_state: Optional[TrainState] = None) -> TrainState:
        """Builds and places the initial TrainState.

        ``host_state`` reuses pre-built state VALUES (host or device
        arrays) and only re-places them onto this trainer's mesh — the
        multichip dryrun shares one init across its three mesh legs this
        way (init is deterministic in the config seed, so the legs would
        build identical values anyway; sharing skips two rebuilds).
        """
        if host_state is None:
            rng, self._rng = jax.random.split(self._rng)
            host_state = self._build_state(
                rng, jnp.asarray(sample_batch.observations),
                jnp.asarray(sample_batch.actions))
        self.state = mesh_lib.place_state(self.mesh, host_state,
                                          min_channels=self._tp_min_channels)
        return self.state

    def abstract_state(self, sample_batch) -> TrainState:
        """ShapeDtypeStruct pytree of the TrainState `init_state` would
        build — for AOT `.lower(...).compile()` of a train step without
        touching the device (bench.py compiles in the background while
        latency benches own the chip)."""
        obs = jax.ShapeDtypeStruct(np.shape(sample_batch.observations),
                                   jnp.float32)
        acts = jax.ShapeDtypeStruct(np.shape(sample_batch.actions), jnp.int32)
        return jax.eval_shape(self._build_state, jax.random.PRNGKey(0),
                              obs, acts)

    def save_checkpoint(self, name: Optional[str] = None):
        directory = self.config["logging"]["save_root_directory"]
        ckpt_lib.save_checkpoint(
            os.path.join(directory, name if name else "latest"), self.state)

    def load_checkpoint(self, name: Optional[str] = None):
        directory = self.config["logging"]["save_root_directory"]
        path = os.path.join(directory, name if name else "latest")
        self.state = ckpt_lib.restore_checkpoint(path, self.state)
        self.state = mesh_lib.place_state(self.mesh, self.state,
                                          min_channels=self._tp_min_channels)
        self.global_step = int(self.state.step)

    def load_reference_weights(self, path: str):
        """Loads model weights from a reference PyTorch .pth.tar checkpoint
        (the released CADDY checkpoints, reference README.md:89-94),
        converted through utils/reference_checkpoint.py.  Optimizer state
        and step are left as initialized — this is a weight import, not a
        resume."""
        from playablevideogeneration_tpu.utils.reference_checkpoint import (
            load_reference_checkpoint,
        )

        assert self.state is not None, "call init_state first"
        variables = load_reference_checkpoint(path)
        self.state = self.state.replace(
            params=jax.tree.map(jnp.asarray, variables["params"]),
            batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
            model_state=jax.tree.map(jnp.asarray, variables["model_state"]),
        )
        self.state = mesh_lib.place_state(self.mesh, self.state,
                                          min_channels=self._tp_min_channels)
        self.logger.print(f"- Imported reference checkpoint weights from {path}")

    # ------------------------------------------------------------------ #
    # Schedules (host side)                                               #
    # ------------------------------------------------------------------ #

    def get_ground_truth_observations_count(self) -> int:
        t = self.config["training"]
        return schedules.ground_truth_observations_count(
            self.global_step, t["ground_truth_observations_start"],
            t["ground_truth_observations_end"], t["ground_truth_observations_steps"])

    def get_gumbel_temperature(self) -> float:
        t = self.config["training"]
        return schedules.gumbel_temperature(
            self.global_step, t["gumbel_temperature_start"],
            t["gumbel_temperature_end"], t["gumbel_temperature_steps"])

    def get_observations_count(self) -> int:
        b = self.config["training"]["batching"]
        return schedules.observations_count(
            self.global_step, b["observations_count_start"],
            b["observations_count"], b["observations_count_steps"])

    # ------------------------------------------------------------------ #
    # Jitted step                                                         #
    # ------------------------------------------------------------------ #

    def _make_train_step(self, pretraining: bool):
        t = self.config["training"]
        loss_weights = dict(t["loss_weights"])
        mi_lambda = t.get("action_mutual_information_entropy_lambda", 1.0)
        use_motion = t["use_motion_weights"]
        motion_bias = t["motion_weights_bias"]
        mi_alpha = t.get("mutual_information_estimation_alpha", 0.2) \
            if self.smooth_mi else None
        model = self.model
        tx = self.tx
        model_dtype = self.model.dtype
        smooth_mi = self.smooth_mi

        # Forward-identical VGG backward-pass optimizations (models/vgg.py):
        # subpixel conv0 input gradient + elementwise max-pool gradient.
        # Default off: the on-chip A/B measured them a net 28 ms/step SLOWER
        # on the BAIR-class workload (docs/PROFILE_r4.md "Ablations").
        tpu_cfg = self.config.get("tpu", {})
        vgg_grad_subpixel = tpu_cfg.get("vgg_grad_subpixel", 0)
        vgg_fast_pool_grad = tpu_cfg.get("vgg_fast_pool_grad", False)
        # One batch-concatenated gt+rec VGG pass per resolution instead of
        # two separate ones (losses.perceptual_loss batched_gt).
        vgg_batched_gt = tpu_cfg.get("vgg_batched_gt", False)

        def train_step(state: TrainState, observations, actions, gt_init,
                       gumbel_temperature, rng, vgg_variables):
            vgg_apply = vgg_lib.make_vgg_apply(
                vgg_variables, dtype=model_dtype,
                grad_subpixel=vgg_grad_subpixel,
                fast_pool_grad=vgg_fast_pool_grad)

            def loss_fn(params):
                variables = {
                    "params": params,
                    "batch_stats": state.batch_stats,
                    "model_state": state.model_state,
                }
                total, aux = compute_loss_terms(
                    model, variables, observations, actions, gt_init,
                    gumbel_temperature, rng, vgg_apply, loss_weights, mi_lambda,
                    pretraining, use_motion, motion_bias,
                    state.mi_matrix if smooth_mi else None, mi_alpha,
                    vgg_batched_gt=vgg_batched_gt)
                return total, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            mutated = aux["mutated"]
            new_state = TrainState(
                params=new_params,
                opt_state=new_opt_state,
                batch_stats=mutated.get("batch_stats", state.batch_stats),
                model_state=mutated.get("model_state", state.model_state),
                mi_matrix=aux["new_mi_matrix"] if smooth_mi else state.mi_matrix,
                step=state.step + 1,
            )
            metrics = dict(aux["info"])
            metrics["loss"] = loss
            # Gradient-norm observability (wandb.watch equivalent,
            # reference train.py:70): global + per-subnetwork L2 norms.
            def _sq_sum(tree):
                return sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                           for g in jax.tree.leaves(tree))

            metrics["grad_norm/global"] = jnp.sqrt(_sq_sum(grads))
            for module_name, module_grads in grads.items():
                metrics[f"grad_norm/{module_name}"] = jnp.sqrt(
                    _sq_sum(module_grads))
            if self._grad_histograms:
                for module_name, module_grads in grads.items():
                    flat = jnp.concatenate(
                        [jnp.ravel(g).astype(jnp.float32)
                         for g in jax.tree.leaves(module_grads)])
                    # (counts, edges) matches np.histogram's contract, so
                    # the host side can hand it straight to
                    # wandb.Histogram(np_histogram=...).  Hand-rolled
                    # rather than jnp.histogram so an all-equal gradient
                    # tensor still yields non-degenerate edges under jit.
                    lo, hi = flat.min(), flat.max()
                    hi = jnp.where(hi <= lo, lo + 1e-12, hi)
                    edges = lo + (hi - lo) * jnp.linspace(0.0, 1.0, 65)
                    idx = jnp.clip(
                        jnp.searchsorted(edges, flat, side="right") - 1,
                        0, 63)
                    counts = jnp.zeros((64,), jnp.int32).at[idx].add(1)
                    metrics[f"_grad_hist/{module_name}"] = (counts, edges)
            # Always returned (a few KB): a separate plot-step program would
            # recompile the whole train step just to expose these.
            metrics["_plot_arrays"] = aux["plot_arrays"]
            return new_state, metrics

        donate = (0,) if self.config.get("tpu", {}).get("donate_state", True) else ()
        return jax.jit(train_step, donate_argnums=donate)

    def _get_train_step(self, observations_count: int, pretraining: bool):
        key = (observations_count, pretraining)
        if key not in self._jitted:
            self._jitted[key] = self._make_train_step(pretraining)
        return self._jitted[key]

    def _stop_profile(self):
        import jax.profiler

        jax.profiler.stop_trace()
        self._profiling = False
        self.profile_dir, written = None, self.profile_dir  # one window per run
        self.logger.print(f"- Wrote profiler trace to {written}")

    # ------------------------------------------------------------------ #
    # Action-space plots                                                  #
    # ------------------------------------------------------------------ #

    def _plot_action_space(self, arrays):
        """TSNE direction-space + action-state trajectory plots every
        `action_direction_plotting_freq` steps (reference
        trainer.py:543-548, utils/tensor_displayer.py:50-167)."""
        out_dir = self.config["logging"].get("output_images_directory")
        if not out_dir:
            return
        from playablevideogeneration_tpu.utils import tensor_displayer

        os.makedirs(out_dir, exist_ok=True)
        step = self.global_step
        tensor_displayer.show_action_directions(
            arrays["centroids"], arrays["action_directions_distribution"],
            arrays["action_probabilities"],
            os.path.join(out_dir, f"action_directions_{step}.png"))
        tensor_displayer.show_action_states(
            arrays["action_states_distribution"],
            arrays["action_probabilities"],
            os.path.join(out_dir, f"action_states_{step}.png"))

    # ------------------------------------------------------------------ #
    # Epoch loop                                                          #
    # ------------------------------------------------------------------ #

    def train_epoch(self, max_steps: Optional[int] = None):
        """One epoch (reference trainer.py:552-609): anneal sequence length,
        iterate batches, break on epoch caps or length changes."""
        assert self.state is not None, "call init_state or load_checkpoint first"
        self.logger.print(f"== Train [{self.global_step}] ==")
        observations_count = self.get_observations_count()
        self.dataset.set_observations_count(observations_count)

        performed_steps = 0
        for batch in self.dataloader:
            if performed_steps > self.config["training"]["max_steps_per_epoch"]:
                break
            if max_steps is not None and self.global_step >= max_steps:
                break
            self.global_step += 1
            performed_steps += 1
            if self.get_observations_count() != observations_count:
                break

            pretraining = self.global_step <= self.config["training"]["pretraining_steps"]
            gt_init = self.get_ground_truth_observations_count()
            # Cap at T-1 (reference trainer.py:258-259,418-419).
            gt_init = min(gt_init, observations_count - 1)
            gumbel_t = self.get_gumbel_temperature()

            if (self.profile_dir is not None and not self._profiling
                    and performed_steps == 3):
                # Steps 1-2 of the epoch are compile+warmup; trace a
                # 5-step window (works for short and resumed runs alike).
                jax.profiler.start_trace(self.profile_dir)
                self._profiling = True
                self._profile_stop_at = self.global_step + 5
            elif self._profiling and self.global_step >= self._profile_stop_at:
                self._stop_profile()

            rng, self._rng = jax.random.split(self._rng)
            plot_freq = self.config["training"]["action_direction_plotting_freq"]
            want_plots = bool(plot_freq) and self.global_step % plot_freq == 0
            step_fn = self._get_train_step(observations_count, pretraining)
            obs = mesh_lib.put_batch(self.mesh, batch.observations)
            acts = mesh_lib.put_batch(self.mesh, batch.actions)

            start = time.perf_counter()
            self.state, metrics = step_fn(
                self.state, obs, acts,
                jnp.asarray(gt_init, jnp.int32),
                jnp.asarray(gumbel_t, jnp.float32), rng, self.vgg_variables)
            metrics = jax.device_get(metrics)
            plot_arrays = metrics.pop("_plot_arrays")
            if want_plots:
                self._plot_action_space(plot_arrays)
            grad_hists = {k[len("_grad_hist/"):]: metrics.pop(k)
                          for k in list(metrics)
                          if k.startswith("_grad_hist/")}
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["step_time"] = time.perf_counter() - start
            # Device memory observability (reference MemoryDisplayer,
            # utils/memory_displayer.py:10-21).
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                if "bytes_in_use" in stats:
                    metrics["device_memory_mb"] = stats["bytes_in_use"] / 2**20
            except Exception:
                pass
            metrics["ground_truth_observations"] = gt_init
            metrics["gumbel_temperature"] = gumbel_t
            metrics["observations_count"] = observations_count
            self.average_meter.add(metrics)

            lr = float(self.lr_schedule(self.global_step))
            # Reference-parity quirk kept deliberately: the reference's
            # `(global_step - 1) % 1 == 0` (trainer.py:592) is always true,
            # so the meter is drained every step and the 10-step wandb log
            # carries the CURRENT step's values, not 10-step means — as in
            # the reference.  (Same for the increment-before-length-break
            # and `performed_steps > max` epoch-cap semantics above,
            # reference trainer.py:564-574.)
            if (self.global_step - 1) % 1 == 0:
                avg = {k: self.average_meter.pop(k) for k in metrics}
                parts = " ".join(f"{k}:{v:.3f}" for k, v in sorted(avg.items())
                                 if k in ("loss", "avg_observations_rec_loss",
                                          "avg_perceptual_loss", "states_rec_loss",
                                          "action_mutual_information_loss",
                                          "step_time"))
                self.logger.print(
                    f"step: {self.global_step}/{self.config['training']['max_steps']} "
                    f"{parts} lr: {lr:.5f}")
                if (self.global_step - 1) % 10 == 0:
                    logged = {f"train/{k}": v for k, v in avg.items()}
                    logged["train/lr"] = lr
                    for name, np_histogram in grad_hists.items():
                        hist = self.logger.histogram(np_histogram)
                        if hist is not None:
                            logged[f"train/grad_hist/{name}"] = hist
                    self.logger.log(logged, step=self.global_step)

        if self._profiling:  # short epoch: finalize the trace anyway
            self._stop_profile()


def make_trainer(config, model, dataset, logger, **kw) -> Trainer:
    """Plain-MI trainer (reference training/trainer.py:612)."""
    return Trainer(config, model, dataset, logger, smooth_mi=False, **kw)
