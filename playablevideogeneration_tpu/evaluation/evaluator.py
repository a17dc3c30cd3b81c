"""In-training evaluator.

Reference: evaluation/evaluator.py:28-498.  Runs the model fully
autoregressively (one ground-truth init frame) over the validation set,
computes per-position sequence losses, action-space diagnostics, sample
image grids, and action accuracy via Hungarian matching; exposes the
resulting ground-truth -> model action mapping (used by train.py:99-106 to
drive GroundTruthActionSampler evaluation).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from playablevideogeneration_tpu.data.loader import DataLoader
from playablevideogeneration_tpu.evaluation.hungarian import compute_actions_accuracy
from playablevideogeneration_tpu.models import vgg as vgg_lib
from playablevideogeneration_tpu.training import losses
from playablevideogeneration_tpu.utils.logging import AverageMeter, Logger


class Evaluator:
    def __init__(self, config, model, dataset, logger: Logger, action_sampler=None,
                 logger_prefix: str = "test", vgg_variables=None):
        self.config = config
        self.model = model
        self.dataset = dataset
        self.logger = logger
        self.logger_prefix = logger_prefix
        self.action_sampler = action_sampler
        self._sampler_label: Optional[str] = None
        self.max_evaluation_batches = config["evaluation"]["max_evaluation_batches"]
        self.best_action_mappings: Optional[Dict[int, int]] = None

        b = config["evaluation"]["batching"]
        self.dataloader = DataLoader(dataset, batch_size=b["batch_size"],
                                     shuffle=False, drop_last=True,
                                     num_workers=b["num_workers"])
        if vgg_variables is None:
            from playablevideogeneration_tpu.utils import pretrained

            vgg_variables, _ = pretrained.get_vgg_variables(config)
        self.vgg_apply = vgg_lib.make_vgg_apply(vgg_variables)
        self._jitted = {}

    def set_action_sampler(self, action_sampler, label: Optional[str] = None):
        """Swaps the action sampler (reference evaluator.py:78-81).

        The jitted forward closes over the sampler, so programs are cached
        per (sampler, sequence length) — the Gumbel and one-hot programs
        compile once ever; only a genuinely new sampler closure (the
        per-round GT-mapping sampler) compiles fresh.  Clearing the whole
        cache here used to force three full recompilations of the
        autoregressive eval program on EVERY evaluation round.

        `label` tags this pass's metric keys (e.g. 'one_hot',
        'gt_actions') so wandb does not overwrite the default pass's
        values at the same step (all three cli/train.py passes log at
        global_step)."""
        self.action_sampler = action_sampler
        self._sampler_label = label

    def get_best_action_mappings(self) -> Dict[int, int]:
        if self.best_action_mappings is None:
            raise RuntimeError("Action mapping requires a prior evaluate() call")
        return self.best_action_mappings

    def _forward(self, variables, observations, actions, rng, observations_count):
        key = (self.action_sampler, observations_count)
        if key in self._jitted:
            # LRU touch: the long-lived (None)/(one_hot) programs are the
            # oldest entries; without this, rounds of fresh GT-mapping
            # samplers would evict exactly the most-reused programs.
            self._jitted[key] = self._jitted.pop(key)
        else:
            # Bounded cache: fresh GT-mapping samplers arrive every round;
            # evict the least-recently-used program instead of growing forever.
            while len(self._jitted) >= 6:
                del self._jitted[next(iter(self._jitted))]
            model = self.model
            sampler = self.action_sampler

            def fn(variables, observations, actions, rng):
                return model.apply(
                    variables, observations, actions, 1, train=False,
                    gumbel_temperature=jnp.asarray(0.4),
                    action_sampler=sampler,
                    rngs={"sample": rng})

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key](variables, observations, actions, rng)

    def evaluate(self, variables, step: int, save_images: bool = True) -> Dict[str, float]:
        """Evaluates the model; returns the logged metric dict
        (reference evaluator.py:95-290)."""
        meter = AverageMeter()
        all_pred, all_gt = [], []
        rng = jax.random.PRNGKey(1234 + step)
        self.logger.print(f"== Evaluation [{step}][{self.logger_prefix}] ==")

        batches_done = 0
        first_batch_out = None
        for batch in self.dataloader:
            if (self.max_evaluation_batches is not None
                    and batches_done >= self.max_evaluation_batches):
                break
            batches_done += 1
            rng, sub = jax.random.split(rng)
            obs = jnp.asarray(batch.observations)
            acts = jnp.asarray(batch.actions)
            out = self._forward(variables, obs, acts, sub, obs.shape[1])
            if first_batch_out is None:
                first_batch_out = (batch, out)

            entropy = losses.entropy_logits(out.action_logits)
            samples_entropy = losses.entropy_probabilities(out.action_samples)
            dist_entropy = losses.entropy_probabilities(
                out.action_samples.mean(axis=(0, 1))[None])
            dir_kl = losses.kl_gaussian_divergence(out.action_directions_distribution)
            mi = losses.mutual_information_loss(
                jax.nn.softmax(out.action_logits, axis=-1),
                jax.nn.softmax(out.reconstructed_action_logits, axis=-1))

            obs_avg, obs_terms = losses.sequence_loss(
                lambda a, b: losses.observations_loss(a, b),
                obs, out.reconstructed_observations)
            per_avg, per_terms = losses.sequence_loss(
                lambda a, b: losses.perceptual_loss(self.vgg_apply, a, b),
                obs, out.reconstructed_observations)
            st_avg, st_terms = losses.sequence_loss(
                losses.states_loss, out.states, out.reconstructed_states)

            results = {
                "observations_loss/avg": float(obs_avg),
                "perceptual_loss/avg": float(per_avg),
                "states_loss/avg": float(st_avg),
                "entropy": float(entropy),
                "samples_entropy": float(samples_entropy),
                "action_distribution_entropy": float(dist_entropy),
                "action_directions_kl_loss": float(dir_kl),
                "action_mutual_information_loss": float(mi),
            }
            for i in range(obs_terms.shape[0]):
                results[f"observations_loss/pos_{i}"] = float(obs_terms[i])
                results[f"perceptual_loss/pos_{i}"] = float(per_terms[i])
                results[f"states_loss/pos_{i}"] = float(st_terms[i])
            meter.add(results)

            all_pred.append(np.asarray(out.selected_actions).reshape(-1))
            # The last action of each sequence cannot be predicted
            # (reference evaluator.py:207).
            all_gt.append(np.asarray(batch.actions[:, :-1]).reshape(-1))

        if not all_pred:
            self.logger.print("- No evaluation batches available")
            return {}

        accuracy, mapping = compute_actions_accuracy(
            np.concatenate(all_pred), np.concatenate(all_gt),
            self.config["data"]["actions_count"])
        self.best_action_mappings = mapping

        # Per-pass key prefix: the three cli/train.py passes (Gumbel,
        # one-hot, GT-mapped) all log at the same global step; without a
        # label wandb keeps only the last value per key.
        prefix = self.logger_prefix
        if self._sampler_label:
            prefix = f"{prefix}/{self._sampler_label}"
        log_data = {f"{prefix}/actions_accuracy": accuracy}
        keys = [
            "observations_loss/avg", "perceptual_loss/avg", "states_loss/avg",
            "entropy", "samples_entropy", "action_distribution_entropy",
            "action_directions_kl_loss", "action_mutual_information_loss",
        ]
        seq_len = first_batch_out[0].observations.shape[1]
        for i in range(seq_len):
            keys += [f"observations_loss/pos_{i}", f"perceptual_loss/pos_{i}",
                     f"states_loss/pos_{i}"]
        for key in keys:
            try:
                log_data[f"{prefix}/{key}"] = meter.pop(key)
            except KeyError:
                pass

        if save_images:
            self._save_examples(first_batch_out[0], first_batch_out[1], step)

        self.logger.log(log_data, step=step)
        for key in ("observations_loss/avg", "perceptual_loss/avg", "states_loss/avg"):
            self.logger.print(f"- {key}: {log_data[prefix + '/' + key]:.3f}")
        self.logger.print(f"- actions_accuracy: {accuracy:.3f}")
        return log_data

    @staticmethod
    def _attention_overlay(frames: np.ndarray, attention: np.ndarray) -> np.ndarray:
        """Overlays a low-res [0, 1] attention map on [-1, 1] frames
        (reference evaluator.py:314-436 attention rows): the map is
        nearest-upsampled to frame resolution and modulates brightness."""
        t, h, w = frames.shape[:3]
        att = np.asarray(attention)[..., 0]  # (T, h', w')
        # Nearest-neighbor upsample by index maps: exact for any ratio
        # (np.repeat by h//h' under-fills whenever the frame is not an
        # integer multiple of the attention grid).
        ys = np.arange(h) * att.shape[1] // h
        xs = np.arange(w) * att.shape[2] // w
        att = att[:, ys][:, :, xs][..., None]
        return frames * att + (1.0 - att) * -1.0  # unattended -> black

    def _save_examples(self, batch, out, step: int, max_sequences: int = 4):
        """Writes image grids per sequence: ground truth, reconstruction,
        GT-attention overlay, reconstructed-attention overlay, and motion
        weight mask (reference evaluator.py:314-436)."""
        out_dir = self.config["logging"].get("output_images_directory")
        if not out_dir:
            return
        os.makedirs(out_dir, exist_ok=True)
        gt = np.asarray(batch.observations[..., :3])  # (B, T, H, W, 3) in [-1,1]
        rec = np.asarray(out.reconstructed_observations)  # (B, T-1, H, W, 3)
        attention = np.asarray(out.attention)  # (B, T, h, w, 1) in [0,1]
        rec_attention = (np.asarray(out.reconstructed_attention)
                         if out.reconstructed_attention is not None else None)
        motion = np.asarray(losses.motion_weight_mask(
            jnp.asarray(gt), jnp.asarray(rec)))  # (B, T, H, W, 1)
        motion = motion / max(float(motion.max()), 1e-6) * 2.0 - 1.0

        def pad_left(row_frames):
            return [np.zeros_like(row_frames[0])] + list(row_frames)

        n = min(max_sequences, gt.shape[0])
        rows = []
        for b in range(n):
            seq_rows = [
                np.concatenate(list(gt[b]), axis=1),
                np.concatenate(pad_left(rec[b]), axis=1),
                np.concatenate(list(self._attention_overlay(gt[b], attention[b])),
                               axis=1),
                np.concatenate(list(np.repeat(motion[b], 3, axis=-1)), axis=1),
            ]
            if rec_attention is not None:
                seq_rows.insert(3, np.concatenate(pad_left(
                    self._attention_overlay(rec[b], rec_attention[b])), axis=1))
            rows.append(np.concatenate(seq_rows, axis=0))
        grid = np.concatenate(rows, axis=0)
        grid = ((np.clip(grid, -1, 1) + 1.0) * 127.5).astype(np.uint8)
        Image.fromarray(grid).save(
            os.path.join(out_dir, f"{self.logger_prefix}_observations_{step}.png"))


def make_evaluator(config, model, dataset, logger, action_sampler=None,
                   logger_prefix="test", **kw) -> Evaluator:
    return Evaluator(config, model, dataset, logger, action_sampler,
                     logger_prefix, **kw)
