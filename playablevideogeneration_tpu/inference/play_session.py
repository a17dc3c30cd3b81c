"""Interactive inference session: device-resident jitted play step.

Reference: model.py:561-655 + play.py:30-211.  The per-frame path
(E -> R step -> D at batch 1) is one jitted program whose state
(ConvLSTM carries + sliding observation window) stays on device between
steps — no host round-trips beyond the rendered frame readback, which is
the p50 play-latency path in BASELINE.md.  Scripted rollouts run the same
step under `lax.scan`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from playablevideogeneration_tpu.models.caddy import Caddy


class PlaySession:
    def __init__(self, model: Caddy, variables: dict, noise: bool = False):
        self.model = model
        self.actions_count = model.actions_count
        self.action_space_dimension = model.action_space_dimension
        self.noise = noise
        # Inference uses frozen BN statistics; strip mutable bookkeeping.
        self.variables = variables
        self.carry = None
        self.window = None
        self._rng = jax.random.PRNGKey(0)

        model_ref = model

        def step(variables, carry, window, action_onehot, variation):
            return model_ref.apply(variables, carry, window, action_onehot,
                                   variation, method="play_step")

        self._step = jax.jit(step)

        def step_u8(variables, carry, window, action_onehot, variation):
            """Interactive step emitting a display-ready uint8 frame: the
            [-1,1]->uint8 conversion runs on device so the host readback
            moves 3 bytes/pixel instead of 12 (the readback, not the
            compute, bounds interactive latency)."""
            carry, frame, window = model_ref.apply(
                variables, carry, window, action_onehot, variation,
                method="play_step")
            u8 = ((jnp.clip(frame, -1.0, 1.0) + 1.0) * 127.5).astype(jnp.uint8)
            return carry, u8, window

        self._step_u8 = jax.jit(step_u8)

        def rollout(variables, carry, window, action_onehots, variations):
            """N-frame scripted rollout as ONE device program: the scan
            keeps every intermediate frame on device and the host reads
            back a single (N, H, W, 3) uint8 buffer — amortizing the
            per-transfer cost that dominates frame-by-frame generation."""
            def body(c, x):
                carry, window = c
                action, variation = x
                carry, frame, window = model_ref.apply(
                    variables, carry, window, action[None], variation[None],
                    method="play_step")
                u8 = ((jnp.clip(frame[0], -1.0, 1.0) + 1.0) * 127.5
                      ).astype(jnp.uint8)
                return (carry, window), u8

            (carry, window), frames = jax.lax.scan(
                body, (carry, window), (action_onehots, variations))
            return carry, window, frames

        self._rollout = jax.jit(rollout)

    # ------------------------------------------------------------------ #

    def start(self, observation: np.ndarray):
        """Begins a session from an initial stacked observation
        (H, W, 3*stacking) in [-1, 1] (reference model.py:561-568)."""
        self.carry = self.model.apply(self.variables, 1, method="init_play")
        # Model dtype keeps the rollout scan carry type invariant.
        self.window = jnp.asarray(observation)[None].astype(self.model.dtype)
        return self

    def _variation(self) -> jnp.ndarray:
        if self.noise:
            self._rng, k = jax.random.split(self._rng)
            return jax.random.normal(k, (1, self.action_space_dimension))
        return jnp.zeros((1, self.action_space_dimension))

    def generate_next(self, action: int) -> np.ndarray:
        """One interactive step; returns the (H, W, 3) frame in [-1, 1]
        (reference model.py:570-607)."""
        onehot = jax.nn.one_hot(jnp.asarray([action]), self.actions_count)
        self.carry, frame, self.window = self._step(
            self.variables, self.carry, self.window, onehot, self._variation())
        return np.asarray(frame[0])

    def generate_next_u8(self, action: int, block: bool = True):
        """One interactive step returning a display-ready (H, W, 3) uint8
        frame.  With block=False the device array is returned immediately
        (use `np.asarray` later) so the readback can overlap the next
        step's compute — double-buffered interactive display."""
        onehot = jax.nn.one_hot(jnp.asarray([action]), self.actions_count)
        self.carry, frame, self.window = self._step_u8(
            self.variables, self.carry, self.window, onehot, self._variation())
        return np.asarray(frame[0]) if block else frame[0]

    def generate_next_interpolation(self, first_action: int, second_action: int,
                                    interpolation_factor: float) -> np.ndarray:
        """Action interpolation via centroid-line variation vectors
        (reference model.py:609-655)."""
        centroids = np.asarray(self.variables["model_state"]["centroids"])
        selected = second_action if interpolation_factor > 0.5 else first_action
        first_c, second_c = centroids[first_action], centroids[second_action]
        interpolated = (second_c - first_c) * interpolation_factor + first_c
        variation = jnp.asarray(interpolated - centroids[selected])[None]
        onehot = jax.nn.one_hot(jnp.asarray([selected]), self.actions_count)
        self.carry, frame, self.window = self._step(
            self.variables, self.carry, self.window, onehot, variation)
        return np.asarray(frame[0])

    def rollout(self, actions: np.ndarray) -> np.ndarray:
        """Scripted rollout of N actions as one `lax.scan` program;
        returns (N, H, W, 3) uint8 frames (single device->host transfer).
        Honors the session's `noise` flag exactly like the interactive
        path, so a scripted rollout reproduces interactive behavior."""
        onehots = jax.nn.one_hot(jnp.asarray(actions), self.actions_count)
        if self.noise:
            self._rng, k = jax.random.split(self._rng)
            variations = jax.random.normal(
                k, (len(actions), self.action_space_dimension))
        else:
            variations = jnp.zeros((len(actions), self.action_space_dimension))
        self.carry, self.window, frames = self._rollout(
            self.variables, self.carry, self.window, onehots, variations)
        return np.asarray(frames)


def frame_to_uint8(frame: np.ndarray) -> np.ndarray:
    """[-1, 1] float frame -> uint8 RGB (no-op for already-uint8 frames
    produced by the device-side conversion paths)."""
    frame = np.asarray(frame)
    if frame.dtype == np.uint8:
        return frame
    return ((np.clip(frame, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)
