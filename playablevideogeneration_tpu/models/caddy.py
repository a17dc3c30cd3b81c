"""CADDY: the full playable-video-generation model, TPU-native.

Reference: model/main_model/model.py:19-659 (main) and
model/reduced_model/model.py:15-44 (reduced; identical except rendering
widths, which here derive from `hidden_state_size`).

Design translation (see SURVEY.md §7):
- The per-timestep autoregressive python loop with re-encoding of the
  model's own outputs (reference model.py:215-260) becomes a single
  `lax.scan` whose carry holds the ConvLSTM states, the sliding stacked
  observation window, and the current input state.  The ground-truth vs
  reconstructed teacher-forcing schedule (reference model.py:241-259,
  499-543) is branchless: each step computes the candidate re-encoded
  state and `jnp.where`-selects against the precomputed ground-truth
  state on `step_index + 1 < ground_truth_observations_init`, which may be
  a *traced* scalar — annealing never triggers recompilation.
- Centroid EMA state lives in the 'model_state' flax collection and is
  updated functionally (see centroids.py).
- Noise: the reference draws N(0,1) noise per step (model.py:488-497) but
  the dynamics network never consumes it (conv_dynamics_network.py:30-31),
  so no noise is generated here.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from playablevideogeneration_tpu.models import centroids as centroid_ops
from playablevideogeneration_tpu.models.action import ActionNetwork
from playablevideogeneration_tpu.models.dynamics import ConvDynamicsNetwork, DynamicsCarry
from playablevideogeneration_tpu.models.gumbel import gumbel_softmax_sample
from playablevideogeneration_tpu.models.outputs import ModelOutput
from playablevideogeneration_tpu.models.rendering import RenderingNetwork
from playablevideogeneration_tpu.models.representation import RepresentationNetwork
from playablevideogeneration_tpu.utils import tensor_ops as tops

# (log_probs (N, A), ground_truth_actions (N,)) -> samples (N, A)
ActionSampler = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
# (sampled_directions (N, D), samples (N, A)) -> variations (N, D)
VariationSampler = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def resolve_remat_policy(name: Optional[str]):
    """Maps a `tpu.remat_policy` config string to a jax.checkpoint policy
    (None = full rematerialization, the memory-minimal default)."""
    if name is None or name == "full":
        return None
    if name == "dots":
        # Saves every conv/matmul output inside the scan step; the
        # backward then recomputes only elementwise/norm chains.
        return jax.checkpoint_policies.dots_saveable
    if name == "dots_no_batch":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name.startswith("names:"):
        # '+' is accepted as a separator so a names policy can ride
        # inside comma-separated sweep lists (tools/train_tune.py
        # --policies 'full,names:convout32+convout64').
        names = [n for n in name[len("names:"):]
                 .replace("+", ",").split(",") if n]
        return jax.checkpoint_policies.save_only_these_names(*names)
    raise ValueError(f"Unknown tpu.remat_policy '{name}' "
                     "(expected full|dots|dots_no_batch|names:<a,b,...>; "
                     "the models tag conv/upsample outputs as "
                     "convout32/64/128/256 and upout64/128/256 — see "
                     "layers.tag_activation)")


class Caddy(nn.Module):
    actions_count: int
    action_space_dimension: int
    state_features: int
    state_resolution: Tuple[int, int]  # (height, width)
    hidden_state_size: int
    observation_stacking: int
    use_gumbel: bool = True
    hard_gumbel: bool = False
    use_variations: bool = True
    centroid_alpha: float = 0.1
    ensemble_size: int = 1
    rendering_widths: Optional[Tuple[int, int, int]] = None
    # Detach the dynamics input states during pretraining so no gradient
    # flows from the dynamics into the representation network (reference
    # model.py:33,425-431; the full forward forbids it, model.py:354).
    pretraining_detach: bool = False
    # Rematerialize scan-step activations in the backward pass
    # (jax.checkpoint over time, SURVEY.md §7): trades ~1/3 more forward
    # FLOPs for O(T)-fold less activation memory — required for the
    # BAIR-class 256px workload to fit one chip's HBM.
    remat: bool = False
    # Selective-checkpoint policy for the scan step (tools/remat_tune.py
    # measures these on-chip):
    #   None / "full"  recompute everything (minimum memory);
    #   "dots"         save conv/matmul outputs inside the step, recompute
    #                  only the cheap elementwise chain — cuts the
    #                  backward's recompute FLOPs to ~0 at the cost of
    #                  holding the step's conv activations.
    remat_policy: Optional[str] = None
    # Space-to-depth factors for the rendering RGB heads (see
    # RenderingNetwork.final_subpixel); same math, MXU-friendly layout.
    rendering_subpixel: Tuple[int, int, int] = (0, 0, 4)
    # "strided" (default): one stride-f conv on the fine grid, no layout
    # passes; "block": explicit space-to-depth grid (ops/subpixel_conv.py).
    rendering_subpixel_mode: str = "strided"
    # x2 bilinear upsample implementation for the rendering stages:
    # "deconv" (one depthwise input-dilated conv, ops/resize.py — the
    # measured fastest: 726 ms/step vs 989 phases-f32 at BAIR batch 16,
    # docs/PROFILE_r5.md), "phases" (blends + reshape interleaves), or
    # "xla" (jax.image.resize). Exact either way.
    resize_impl: str = "deconv"
    # Space-to-depth factor for the encoder stem conv (see
    # RepresentationNetwork.stem_subpixel); exact same math. Default off:
    # measured −23 ms/step on the BAIR-class workload (docs/PROFILE_r4.md
    # "Ablations"); kept as a knob for other shapes.
    stem_subpixel: int = 0
    # Fuse the rendering UpBlocks' bilinear x2 + conv into one coarse-grid
    # conv (exact; ops/fused_upsample_conv.py). Default off: measured
    # −78 ms/step — the border-correction scatters outweigh the saved
    # upsample materialization (docs/PROFILE_r4.md "Ablations").
    fuse_upsample: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.representation_network = RepresentationNetwork(
            state_features=self.state_features,
            stem_subpixel=self.stem_subpixel, dtype=self.dtype)
        # Ensemble of action networks (reference model.py:47 keeps an
        # nn.ModuleList; all shipped configs use size 1).
        self.action_networks = tuple(
            ActionNetwork(
                state_features=self.state_features,
                actions_count=self.actions_count,
                action_space_dimension=self.action_space_dimension,
                dtype=self.dtype,
                name=f"action_network_{i}",
            )
            for i in range(self.ensemble_size)
        )
        self.dynamics_network = ConvDynamicsNetwork(
            hidden_state_size=self.hidden_state_size,
            state_resolution=self.state_resolution,
            dtype=self.dtype,
        )
        widths = self.rendering_widths or (
            self.hidden_state_size,
            self.hidden_state_size // 2,
            self.hidden_state_size // 4,
        )
        self.rendering_network = RenderingNetwork(
            widths=tuple(widths), final_subpixel=self.rendering_subpixel,
            final_subpixel_mode=self.rendering_subpixel_mode,
            fuse_upsample=self.fuse_upsample,
            bilinear_impl=self.resize_impl, dtype=self.dtype)
        # Projects states to hidden states during pretraining
        # (reference model.py:41-43).
        self.state_to_hidden = nn.Conv(
            self.hidden_state_size, (3, 3), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="state_to_hidden")
        self.centroids = self.variable(
            "model_state", "centroids",
            lambda: centroid_ops.init_centroids(
                self.make_rng("params"), self.actions_count, self.action_space_dimension))

    # ------------------------------------------------------------------ #
    # Shared front half: encode, act, sample                             #
    # ------------------------------------------------------------------ #

    def _encode_and_act(self, observations, actions, gumbel_temperature, train,
                        action_sampler, variation_sampler, ensemble_index):
        B, T = observations.shape[:2]
        flat_obs = tops.flatten(observations).astype(self.dtype)
        states_flat, attention_flat = self.representation_network(flat_obs, train)
        states = tops.fold(states_flat, T)
        attention = tops.fold(attention_flat, T)

        action_net = self.action_networks[ensemble_index]
        (logits, dirs_dist, sampled_dirs, states_dist, sampled_states) = action_net(
            states, attention, train)

        flat_logits = tops.flatten(logits)
        flat_log_probs = jax.nn.log_softmax(flat_logits, axis=-1)
        flat_probs = jax.nn.softmax(flat_logits, axis=-1)

        # EMA centroid update BEFORE computing variations, train-mode only
        # (reference model.py:170,186; centroid_estimator.py:50-52).
        if train:
            new_centroids = centroid_ops.update_centroids(
                self.centroids.value, tops.flatten(dirs_dist), flat_probs,
                self.centroid_alpha)
            if self.is_mutable_collection("model_state"):
                self.centroids.value = new_centroids
        current_centroids = self.centroids.value

        if action_sampler is not None:
            flat_samples = action_sampler(flat_log_probs, actions[:, :-1].reshape((-1,)))
        elif self.use_gumbel:
            flat_samples = gumbel_softmax_sample(
                self.make_rng("sample"), flat_log_probs, gumbel_temperature,
                hard=self.hard_gumbel)
        else:
            flat_samples = flat_probs

        flat_sampled_dirs = tops.flatten(sampled_dirs)
        flat_variations = centroid_ops.compute_variations(
            flat_sampled_dirs, flat_samples, current_centroids)
        if not self.use_variations:
            flat_variations = flat_variations * 0.0
        if variation_sampler is not None:
            flat_variations = variation_sampler(flat_sampled_dirs, flat_samples)

        action_samples = tops.fold(flat_samples, T - 1)
        variations = tops.fold(flat_variations, T - 1)
        selected_actions = jnp.argmax(action_samples, axis=2)

        return dict(
            states=states, attention=attention,
            logits=logits, dirs_dist=dirs_dist, sampled_dirs=sampled_dirs,
            states_dist=states_dist, sampled_states=sampled_states,
            action_samples=action_samples, variations=variations,
            selected_actions=selected_actions,
        )

    # ------------------------------------------------------------------ #
    # Full forward: autoregressive rollout with mixed teacher forcing    #
    # ------------------------------------------------------------------ #

    def __call__(self, observations, actions, ground_truth_observations_init,
                 pretraining: bool = False, gumbel_temperature=1.0,
                 action_sampler: Optional[ActionSampler] = None,
                 variation_sampler: Optional[VariationSampler] = None,
                 train: bool = True, ensemble_index: int = 0) -> ModelOutput:
        """Forward pass (reference model.py:57-82).

        :param observations: (B, T, H, W, 3*observation_stacking), frames
            most-recent-first along channels, values in [-1, 1]
        :param actions: (B, T) int ground truth action indices
        :param ground_truth_observations_init: number of ground-truth frames
            to feed before autoregression; may be a traced scalar
        """
        if pretraining:
            return self.forward_pretraining(
                observations, actions, gumbel_temperature=gumbel_temperature,
                action_sampler=action_sampler, variation_sampler=variation_sampler,
                train=train, ensemble_index=ensemble_index)
        return self.forward_full_model(
            observations, actions, ground_truth_observations_init,
            gumbel_temperature=gumbel_temperature, action_sampler=action_sampler,
            variation_sampler=variation_sampler, train=train,
            ensemble_index=ensemble_index)

    def _scan_collections(self):
        """Collection routing for nn.scan: batch_stats is a carry when
        mutable (training: per-step EMA updates thread through the scan)
        and broadcast when frozen (evaluation)."""
        if self.is_mutable_collection("batch_stats"):
            return dict(variable_broadcast=["params", "model_state"],
                        variable_carry=["batch_stats"],
                        split_rngs={"params": False, "sample": True})
        return dict(variable_broadcast=["params", "model_state", "batch_stats"],
                    split_rngs={"params": False, "sample": True})

    def forward_full_model(self, observations, actions, ground_truth_observations_init,
                           gumbel_temperature=1.0,
                           action_sampler: Optional[ActionSampler] = None,
                           variation_sampler: Optional[VariationSampler] = None,
                           train: bool = True, ensemble_index: int = 0) -> ModelOutput:
        """Autoregressive forward (reference model.py:84-287)."""
        if self.pretraining_detach:
            # Parity with reference model.py:354: the autoregressive model
            # does not support detached pretraining states.
            raise NotImplementedError(
                "pretraining_detach is not supported by the full model")
        B, T = observations.shape[:2]
        front = self._encode_and_act(observations, actions, gumbel_temperature,
                                     train, action_sampler, variation_sampler,
                                     ensemble_index)
        states, attention = front["states"], front["attention"]
        gt_init = ground_truth_observations_init

        lstm0 = self.dynamics_network.init_carry(B)
        window0 = tops.flatten(observations[:, 0:1]).astype(self.dtype)
        carry0 = (lstm0, window0, states[:, 0])

        xs = dict(
            t=jnp.arange(T - 1),
            action=tops.time_major(front["action_samples"]).astype(self.dtype),
            variation=tops.time_major(front["variations"]).astype(self.dtype),
            gt_state=tops.time_major(states[:, 1:]),
            gt_att=tops.time_major(attention[:, 1:]),
            gt_window=tops.time_major(observations[:, 1:]).astype(self.dtype),
        )

        def step(mdl, carry, x):
            lstm, window, cur_state = carry
            lstm, hidden = mdl.dynamics_network(
                lstm, cur_state, x["action"], x["variation"], train)
            recon_full, recons = mdl.rendering_network(hidden, train)
            # Slide the stacked-observation window: newest frame first,
            # drop the oldest 3 channels (reference model.py:499-543).
            shifted = jnp.concatenate([recon_full, window[..., :-3]], axis=-1)
            is_gt = (x["t"] + 1) < gt_init
            new_window = jnp.where(is_gt, x["gt_window"], shifted)
            # Re-encode the window; for ground-truth steps select the
            # precomputed state so numerics match the up-front encoding
            # (reference model.py:241-243).
            comp_state, comp_att = mdl.representation_network(new_window, train)
            next_state = jnp.where(is_gt, x["gt_state"], comp_state)
            next_att = jnp.where(is_gt, x["gt_att"], comp_att)
            ys = (hidden, tuple(recons), next_state, next_att)
            return (lstm, new_window, next_state), ys

        if self.is_initializing():
            # Create the dynamics/rendering variables outside the scan so the
            # batch_stats carry pytree is complete before scanning.
            step(self, carry0, jax.tree.map(lambda v: v[0], xs))

        if self.remat:
            step_fn = nn.remat(step, prevent_cse=False,
                               policy=resolve_remat_policy(self.remat_policy))
        else:
            step_fn = step
        scan = nn.scan(step_fn, in_axes=0, out_axes=0, **self._scan_collections())
        _, (hiddens, recons, next_states, next_atts) = scan(self, carry0, xs)

        hidden_states = tops.batch_major(hiddens)
        multires = [tops.batch_major(r) for r in recons]
        reconstructed_states = jnp.concatenate(
            [states[:, 0:1], tops.batch_major(next_states)], axis=1)
        reconstructed_attention = tops.batch_major(next_atts)
        complete_attention = jnp.concatenate(
            [attention[:, 0:1], reconstructed_attention], axis=1)

        # Re-estimate actions on the reconstructed sequence for the MI loss
        # (reference model.py:274).
        action_net = self.action_networks[ensemble_index]
        (r_logits, r_dirs_dist, r_sampled_dirs, r_states_dist, r_sampled_states) = \
            action_net(reconstructed_states, complete_attention, train)

        return ModelOutput(
            reconstructed_observations=multires[0],
            multiresolution_reconstructed_observations=multires,
            reconstructed_states=reconstructed_states,
            states=states,
            hidden_states=hidden_states,
            selected_actions=front["selected_actions"],
            action_logits=front["logits"],
            action_samples=front["action_samples"],
            attention=attention,
            reconstructed_attention=reconstructed_attention,
            action_directions_distribution=front["dirs_dist"],
            sampled_action_directions=front["sampled_dirs"],
            action_states_distribution=front["states_dist"],
            sampled_action_states=front["sampled_states"],
            action_variations=front["variations"],
            reconstructed_action_logits=r_logits,
            reconstructed_action_directions_distribution=r_dirs_dist,
            reconstructed_sampled_action_directions=r_sampled_dirs,
            reconstructed_action_states_distribution=r_states_dist,
            reconstructed_sampled_action_states=r_sampled_states,
        )

    # ------------------------------------------------------------------ #
    # Pretraining forward                                                #
    # ------------------------------------------------------------------ #

    def forward_pretraining(self, observations, actions, gumbel_temperature=1.0,
                            action_sampler: Optional[ActionSampler] = None,
                            variation_sampler: Optional[VariationSampler] = None,
                            train: bool = True, ensemble_index: int = 0) -> ModelOutput:
        """Pretraining forward: no autoregressive feedback
        (reference model.py:290-468)."""
        B, T = observations.shape[:2]
        front = self._encode_and_act(observations, actions, gumbel_temperature,
                                     train, action_sampler, variation_sampler,
                                     ensemble_index)
        states, attention = front["states"], front["attention"]

        # Decode hidden-state projections of the GT states
        # (reference model.py:413-420).
        flat_states = tops.flatten(states)
        flat_recon_hidden = self.state_to_hidden(flat_states)
        reconstructed_hidden_states = tops.fold(flat_recon_hidden, T)
        _, flat_multires = self.rendering_network(flat_recon_hidden, train)
        multires = [tops.fold(r, T) for r in flat_multires]
        reconstructed_observations = multires[0]

        # Dynamics over GT states only (reference model.py:422-443).
        carry0 = self.dynamics_network.init_carry(B)
        input_states = states[:, :-1]
        if self.pretraining_detach:
            # No gradient from the dynamics network into the representation
            # network (reference model.py:425-431).
            input_states = jax.lax.stop_gradient(input_states)
        xs = dict(
            state=tops.time_major(input_states),
            action=tops.time_major(front["action_samples"]).astype(self.dtype),
            variation=tops.time_major(front["variations"]).astype(self.dtype),
        )

        def step(mdl, carry, x):
            carry, hidden = mdl.dynamics_network(
                carry, x["state"], x["action"], x["variation"], train)
            return carry, hidden

        if self.is_initializing():
            step(self, carry0, jax.tree.map(lambda v: v[0], xs))

        if self.remat:
            step_fn = nn.remat(step, prevent_cse=False,
                               policy=resolve_remat_policy(self.remat_policy))
        else:
            step_fn = step
        scan = nn.scan(step_fn, in_axes=0, out_axes=0, **self._scan_collections())
        _, hiddens = scan(self, carry0, xs)
        hidden_states = tops.batch_major(hiddens)

        # Re-encode the decoded frames and re-estimate actions
        # (reference model.py:448-459).
        stacked = self.compute_stacked_observations(reconstructed_observations)
        flat_stacked = tops.flatten(stacked)
        r_states_flat, r_att_flat = self.representation_network(flat_stacked, train)
        reconstructed_states = tops.fold(r_states_flat, T)
        reconstructed_attention = tops.fold(r_att_flat, T)

        action_net = self.action_networks[ensemble_index]
        (r_logits, r_dirs_dist, r_sampled_dirs, r_states_dist, r_sampled_states) = \
            action_net(reconstructed_states, reconstructed_attention, train)

        return ModelOutput(
            reconstructed_observations=reconstructed_observations,
            multiresolution_reconstructed_observations=multires,
            reconstructed_states=reconstructed_states,
            states=states,
            hidden_states=hidden_states,
            reconstructed_hidden_states=reconstructed_hidden_states,
            selected_actions=front["selected_actions"],
            action_logits=front["logits"],
            action_samples=front["action_samples"],
            attention=attention,
            action_directions_distribution=front["dirs_dist"],
            sampled_action_directions=front["sampled_dirs"],
            action_states_distribution=front["states_dist"],
            sampled_action_states=front["sampled_states"],
            action_variations=front["variations"],
            reconstructed_action_logits=r_logits,
            reconstructed_action_directions_distribution=r_dirs_dist,
            reconstructed_sampled_action_directions=r_sampled_dirs,
            reconstructed_action_states_distribution=r_states_dist,
            reconstructed_sampled_action_states=r_sampled_states,
        )

    def compute_stacked_observations(self, observations: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 3) frames -> (B, T, H, W, 3*stacking) stacked
        observations, clamping at the sequence start
        (reference model.py:470-486)."""
        seqs = [observations]
        for k in range(1, self.observation_stacking):
            repeated_first = jnp.repeat(observations[:, 0:1], k, axis=1)
            shifted = jnp.concatenate([repeated_first, observations[:, :-k]], axis=1)
            seqs.append(shifted)
        return jnp.concatenate(seqs, axis=-1)

    # ------------------------------------------------------------------ #
    # Interactive inference                                              #
    # ------------------------------------------------------------------ #

    def init_play(self, batch_size: int = 1) -> DynamicsCarry:
        """Fresh recurrent state for interactive generation
        (reference model.py:561-568)."""
        return self.dynamics_network.init_carry(batch_size)

    def play_step(self, carry: DynamicsCarry, observation: jnp.ndarray,
                  action_onehot: jnp.ndarray, variation: jnp.ndarray):
        """One interactive generation step (reference model.py:570-607).

        :param observation: (B, H, W, 3*observation_stacking) current window
        :param action_onehot: (B, actions_count)
        :param variation: (B, action_space_dimension)
        :return: (new_carry, frame (B, H, W, 3), next_observation window)
        """
        obs = observation.astype(self.dtype)
        state, _att = self.representation_network(obs, train=False)
        carry, hidden = self.dynamics_network(
            carry, state, action_onehot.astype(self.dtype),
            variation.astype(self.dtype), train=False)
        frame, _ = self.rendering_network(hidden, train=False)
        next_observation = jnp.concatenate([frame, obs[..., :-3]], axis=-1)
        return carry, frame, next_observation


def init_model_variables(model: Caddy, rng: jax.Array, observations: jnp.ndarray,
                         actions: jnp.ndarray):
    """Initializes all model variables.

    Uses the pretraining forward, which touches every submodule including
    `state_to_hidden` (the full forward does not), so a single init covers
    both modes.

    The init runs under `jax.jit`: eager Flax init dispatches thousands of
    individual ops (measured 67 s for a toy model on a 1-core CPU host and
    similar per-op round-trip cost over a TPU tunnel), while one compiled
    program is a single dispatch and its compilation lands in the
    persistent compilation cache.
    """
    def build(rng, observations, actions):
        params_rng, sample_rng = jax.random.split(rng)
        return model.init(
            {"params": params_rng, "sample": sample_rng},
            observations, actions, 1, pretraining=True, train=True)

    return jax.jit(build)(rng, observations, actions)


def _model_from_config(config, rendering_widths=None) -> Caddy:
    m = config["model"]
    if config["training"].get("use_ground_truth_actions"):
        # Parity with reference model.py:182-184,387-388: training on ground
        # truth actions would produce meaningless variation vectors.
        raise NotImplementedError(
            "use_ground_truth_actions during training is not supported by "
            "the selected model")
    dtype = jnp.bfloat16 if config.get("tpu", {}).get("compute_dtype") == "bfloat16" \
        else jnp.float32
    return Caddy(
        actions_count=config["data"]["actions_count"],
        action_space_dimension=m["action_network"]["action_space_dimension"],
        state_features=m["representation_network"]["state_features"],
        state_resolution=tuple(m["representation_network"]["state_resolution"]),
        hidden_state_size=m["dynamics_network"]["hidden_state_size"],
        observation_stacking=config["training"]["batching"]["observation_stacking"],
        use_gumbel=m["action_network"]["use_gumbel"],
        hard_gumbel=m["action_network"]["hard_gumbel"],
        use_variations=m["action_network"].get("use_variations", True),
        centroid_alpha=m["centroid_estimator"]["alpha"],
        ensemble_size=m["action_network"]["ensamble_size"],
        rendering_widths=rendering_widths,
        pretraining_detach=config["training"].get("pretraining_detach", False),
        remat=config.get("tpu", {}).get("remat", False),
        remat_policy=config.get("tpu", {}).get("remat_policy"),
        rendering_subpixel=tuple(
            config.get("tpu", {}).get("rendering_subpixel", (0, 0, 4))),
        rendering_subpixel_mode=config.get("tpu", {}).get(
            "rendering_subpixel_mode", "strided"),
        resize_impl=config.get("tpu", {}).get("resize_impl", "deconv"),
        stem_subpixel=config.get("tpu", {}).get("stem_subpixel", 0),
        fuse_upsample=config.get("tpu", {}).get("fuse_upsample", False),
        dtype=dtype,
    )


def make_model(config) -> Caddy:
    """Factory for BOTH reference variants: the main and reduced models
    differ only in rendering widths (h, h/2, h/4) with h = the config's
    hidden_state_size — 128 for main (model/main_model/
    rendering_network.py:30-41), 64 for reduced (model/reduced_model/
    rendering_network.py:30-41, selected by configs/02_breakout.yaml:25's
    hidden size).  The derivation is proven against both running
    reference variants by tests/test_reference_parity.py, so one factory
    serves both registry names."""
    return _model_from_config(config)


# Registry aliases for the reference's dotted module paths.
make_main_model = make_model
make_reduced_model = make_model
