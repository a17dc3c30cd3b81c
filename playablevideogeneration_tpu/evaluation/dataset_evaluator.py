"""Offline dataset evaluators: metric computation over (reference,
generated) dataset pairs.

Reference: evaluation/dataset_evaluator.py:29-256 (generic / tennis),
dataset_evaluator_breakout.py:15 (1-D platform movements),
dataset_evaluator_bair.py:15 (metadata arm-state movements).

Flow per batch: zip the two dataloaders; per-observation MSE /
motion-masked MSE / PSNR / SSIM / LPIPS / VGG-sim; movement vectors +
inferred actions; aggregate positional statistics; dataset-level FID and
FVD; action-space quality (per-action variance + SVM classification);
density plots.  Output: flat dict dumped to data.yml by the CLI.

Pretrained backbones (LPIPS, FID-Inception, FVD-I3D, tennis detector)
are pluggable; unavailable backbones degrade gracefully with a recorded
'*_unavailable' marker instead of crashing the pipeline (this environment
cannot download weights).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from playablevideogeneration_tpu.data.loader import DataLoader
from playablevideogeneration_tpu.evaluation.metrics import frame_metrics
from playablevideogeneration_tpu.evaluation.metrics.action_metrics import (
    action_classification_score,
    action_variance,
)
from playablevideogeneration_tpu.evaluation.metrics.detection import (
    TennisPlayerDetector,
    breakout_platform_positions,
    detection_metric,
)
from playablevideogeneration_tpu.models import vgg as vgg_lib
from playablevideogeneration_tpu.utils.logging import Logger


class MetricsAccumulator:
    """Concatenating accumulator (reference utils/metrics_accumulator.py:4)."""

    def __init__(self):
        self._data: Dict[str, List[np.ndarray]] = {}

    def add(self, key: str, value: np.ndarray):
        self._data.setdefault(key, []).append(np.asarray(value))

    def pop(self, key: str) -> np.ndarray:
        # Absent keys yield an empty array: e.g. no (movement, action) pair
        # is ever accumulated when the detector backend is 'none'.
        values = self._data.pop(key, [])
        return np.concatenate(values, axis=0) if values else np.zeros((0,))


def compute_positional_statistics(values: np.ndarray, prefix: str) -> Dict:
    """Per-position mean/variance + global average
    (reference dataset_evaluator.py:89-114)."""
    results: Dict = {}
    positional = values.mean(axis=0)
    variances = values.var(axis=0)
    results[f"{prefix}/avg"] = float(positional.mean())
    results[f"{prefix}/var"] = float(positional.var())
    for i, v in enumerate(positional.tolist()):
        results[f"{prefix}/{i}"] = v
    for i, v in enumerate(variances.tolist()):
        results[f"{prefix}/{i}/var"] = v
    return results


class DatasetEvaluator:
    """Generic evaluator (tennis protocol: 2-D player-position movements)."""

    # Whether the protocol compares reference-vs-generated detections
    # (tennis 2-D player positions, breakout 1-D platform positions).
    # BAIR reads arm states from REFERENCE metadata only — generated
    # videos carry no states, so there is nothing to compare and the
    # reference computes no detection metric there
    # (dataset_evaluator_bair.py has no detector).
    uses_detection_metric = True

    def __init__(self, config, logger: Logger, reference_dataset, generated_dataset,
                 vgg_variables=None, lpips_fn=None, fid_extractor=None,
                 fvd_embedder=None, detector: Optional[TennisPlayerDetector] = None,
                 class_probability_fn=None):
        self.config = config
        self.logger = logger
        b = config["evaluation"]["batching"] if "batching" in config.get(
            "evaluation", {}) else config["batching"]
        self.reference_dataloader = DataLoader(
            reference_dataset, batch_size=b["batch_size"], shuffle=False,
            drop_last=False, num_workers=b["num_workers"])
        self.generated_dataloader = DataLoader(
            generated_dataset, batch_size=b["batch_size"], shuffle=False,
            drop_last=False, num_workers=b["num_workers"])
        if len(reference_dataset) != len(generated_dataset):
            raise ValueError(
                f"Reference and generated datasets differ in size: "
                f"{len(reference_dataset)} vs {len(generated_dataset)}")

        if vgg_variables is None:
            vgg_variables = vgg_lib.random_vgg_variables(jax.random.PRNGKey(97))
            self._vgg_pretrained = False
        else:
            self._vgg_pretrained = True
        # VGG params enter the jitted metric program as an argument, not a
        # closure constant (constants would be inlined into the MLIR module).
        self.vgg_variables = vgg_variables
        self.lpips_fn = lpips_fn
        self.fid_extractor = fid_extractor
        self.fvd_embedder = fvd_embedder
        # Inception Score: the reference constructs it but leaves it out of
        # the metric run (dataset_evaluator.py:74); here it is off by
        # default and enabled with evaluation.compute_inception_score.
        self.class_probability_fn = class_probability_fn
        self.compute_is = bool(config.get("evaluation", {}).get(
            "compute_inception_score", False))
        if detector is None:
            from playablevideogeneration_tpu.evaluation.metrics.detection import (
                make_detector,
            )

            detector = make_detector(config)
        self.detector = detector

        self._frame_metrics_jit = jax.jit(self._compute_frame_metrics)

    # ------------------------------------------------------------------ #

    def _compute_frame_metrics(self, vgg_variables, ref, gen):
        vgg_apply = vgg_lib.make_vgg_apply(vgg_variables)
        out = dict(
            mse=frame_metrics.mse(ref, gen),
            motion_masked_mse=frame_metrics.motion_masked_mse(ref, gen),
            psnr=frame_metrics.psnr(ref, gen),
            ssim=frame_metrics.ssim(ref, gen),
            vgg_sim=frame_metrics.vgg_cosine_similarity(vgg_apply, ref, gen),
        )
        if self.lpips_fn is not None:
            out["lpips"] = self.lpips_fn(ref, gen)
        return out

    def compute_detections(self, observations: np.ndarray, batch) -> np.ndarray:
        """(B, T, H, W, C) -> (B, T, D) detections, -1 on failure."""
        return self.detector(observations)

    def movement_source(self) -> str:
        return "detections"

    def compute_movements_and_actions(self, reference_detections: np.ndarray,
                                      generated_batch) -> tuple:
        """(movement, inferred_action) pairs from consecutive successful
        detections (reference dataset_evaluator.py:116-143)."""
        movements, inferred_actions = [], []
        b, t = reference_detections.shape[:2]
        for seq in range(b):
            metadata = generated_batch.videos[seq].metadata
            start = generated_batch.initial_frames[seq]
            for obs in range(t - 1):
                if (reference_detections[seq, obs, 0] != -1
                        and reference_detections[seq, obs + 1, 0] != -1):
                    meta = metadata[start + obs]
                    if "inferred_action" not in meta:
                        continue
                    movements.append(reference_detections[seq, obs + 1]
                                     - reference_detections[seq, obs])
                    inferred_actions.append(meta["inferred_action"])
        return (np.asarray(movements, np.float64),
                np.asarray(inferred_actions, np.int64))

    # ------------------------------------------------------------------ #

    def compute_metrics(self) -> Dict:
        acc = MetricsAccumulator()
        n_batches = len(self.reference_dataloader)
        for idx, (ref_batch, gen_batch) in enumerate(
                zip(self.reference_dataloader, self.generated_dataloader)):
            self.logger.print(f"- Computing metrics for batch [{idx}/{n_batches}]")
            ref_obs = ref_batch.observations  # (B, T, H, W, 3) in [0, 1]
            gen_obs = gen_batch.observations
            if ref_obs.min() < 0 or ref_obs.max() > 1 or gen_obs.min() < 0 \
                    or gen_obs.max() > 1:
                raise ValueError("Input observations outside allowed range [0, 1]")

            metrics = self._frame_metrics_jit(
                self.vgg_variables, jnp.asarray(ref_obs), jnp.asarray(gen_obs))
            for key, value in metrics.items():
                acc.add(key, np.asarray(value))

            ref_det = self.compute_detections(ref_obs, ref_batch)
            if self.uses_detection_metric:
                acc.add("reference_detections", ref_det)
                acc.add("generated_detections",
                        self.compute_detections(gen_obs, gen_batch))

            movements, inferred = self.compute_movements_and_actions(
                ref_det, gen_batch)
            if len(movements):
                acc.add("movements", movements)
                acc.add("inferred_actions", inferred)

        results: Dict = {}
        for key in ("mse", "motion_masked_mse", "psnr", "ssim", "vgg_sim"):
            results.update(compute_positional_statistics(acc.pop(key), key))
        if self.lpips_fn is not None:
            results.update(compute_positional_statistics(acc.pop("lpips"), "lpips"))
        else:
            results["lpips_unavailable"] = "no pretrained LPIPS weights provided"
        if not self._vgg_pretrained:
            results["vgg_sim_note"] = "random VGG19 features (no pretrained weights)"

        # Detection metrics
        if self.uses_detection_metric:
            ref_det = acc.pop("reference_detections")
            gen_det = acc.pop("generated_detections")
            if ref_det.size and bool((ref_det[..., 0] != -1).any()):
                results.update(detection_metric(ref_det, gen_det, "detection"))
            else:
                results["detection_unavailable"] = "no detector backend provided"
        else:
            results["detection_unavailable"] = (
                "protocol computes no detection metric "
                "(reference dataset_evaluator_bair.py has no detector)")

        # Action-space quality
        movements = acc.pop("movements")
        inferred = acc.pop("inferred_actions")
        actions_count = self.config["data"]["actions_count"]
        if len(movements):
            results.update(action_variance(inferred, movements, actions_count))
            results.update(action_classification_score(
                inferred, movements, actions_count))
            self._plot_action_space(inferred, movements, actions_count)
        else:
            results["action_space_unavailable"] = \
                "no (movement, action) pairs could be extracted"

        # FID / FVD
        if self.fid_extractor is not None:
            self.logger.print("- Computing FID score")
            results["fid"] = self._compute_fid()
        else:
            results["fid_unavailable"] = "no FID Inception weights provided"
        if self.fvd_embedder is not None:
            self.logger.print("- Computing FVD score")
            results["fvd"] = self._compute_fvd()
        else:
            results["fvd_unavailable"] = "no FVD I3D weights provided"
        if self.compute_is:
            if self.class_probability_fn is not None:
                self.logger.print("- Computing Inception Score")
                from playablevideogeneration_tpu.evaluation.metrics.inception import (
                    inception_score,
                )

                probs = np.concatenate(
                    [np.asarray(self.class_probability_fn(frames))
                     for frames in self._iter_frames(self.generated_dataloader)],
                    axis=0)
                mean, std = inception_score(probs)
                results["inception_score"] = mean
                results["inception_score_std"] = std
            else:
                results["inception_score_unavailable"] = \
                    "no Inception classifier head available"

        return results

    # ------------------------------------------------------------------ #

    def _iter_frames(self, dataloader):
        for batch in dataloader:
            obs = batch.observations  # (B, T, H, W, 3)
            yield obs.reshape((-1,) + obs.shape[2:])

    def _compute_fid(self) -> float:
        """FID over every frame of both datasets
        (reference fid.py:103-158)."""
        from playablevideogeneration_tpu.evaluation.metrics.fid import (
            compute_statistics_from_frames, fid_from_statistics)

        mu1, s1 = compute_statistics_from_frames(
            self.fid_extractor, self._iter_frames(self.reference_dataloader))
        mu2, s2 = compute_statistics_from_frames(
            self.fid_extractor, self._iter_frames(self.generated_dataloader))
        return fid_from_statistics(mu1, s1, mu2, s2)

    def _compute_fvd(self) -> float:
        from playablevideogeneration_tpu.evaluation.metrics.fvd import compute_fvd

        return compute_fvd(self.fvd_embedder,
                           (b.observations for b in self.reference_dataloader),
                           (b.observations for b in self.generated_dataloader))

    def plot_kwargs(self) -> dict:
        """Dataset-specific plot parameters (reference passes these at the
        evaluator call sites: dataset_evaluator.py:220-223 uses defaults,
        dataset_evaluator_bair.py:126-128 inverts axes and clamps limits,
        dataset_evaluator_breakout.py:140 clamps the 1-D limits)."""
        return {}

    def _plot_action_space(self, actions, movements, actions_count):
        from playablevideogeneration_tpu.evaluation.plotting import density_plots

        out_dir = self.config["logging"].get("output_directory")
        if out_dir:
            density_plots.plot_all(actions, movements, actions_count, out_dir,
                                   **self.plot_kwargs())


class DatasetEvaluatorBreakout(DatasetEvaluator):
    """Breakout: movement = 1-D platform x-position deltas detected by
    color-band scan (reference dataset_evaluator_breakout.py:15)."""

    def compute_detections(self, observations: np.ndarray, batch) -> np.ndarray:
        return breakout_platform_positions(observations)

    def movement_source(self) -> str:
        return "platform"

    def plot_kwargs(self) -> dict:
        # Reference dataset_evaluator_breakout.py:140.
        return {"xlim": (-40, 40), "ylim": (-10, 10)}


class DatasetEvaluatorBair(DatasetEvaluator):
    """BAIR: movement = arm state deltas read from the reference dataset's
    per-frame metadata ["state"] (reference dataset_evaluator_bair.py:62-75);
    no visual detector.  The metadata states feed the generic movement
    pipeline in place of detections."""

    uses_detection_metric = False  # reference computes none for BAIR

    def compute_detections(self, observations: np.ndarray, batch) -> np.ndarray:
        b, t = observations.shape[:2]
        out = None
        for seq in range(b):
            metadata = batch.videos[seq].metadata
            start = batch.initial_frames[seq]
            for obs in range(t):
                meta = metadata[start + obs] if start + obs < len(metadata) else {}
                state = meta.get("state")
                if state is None:
                    continue
                state = np.asarray(state, np.float64).reshape(-1)
                if out is None:
                    out = np.full((b, t, state.shape[0]), -1.0)
                out[seq, obs] = state
        if out is None:
            out = np.full((b, t, 2), -1.0)
        return out

    def movement_source(self) -> str:
        return "metadata"

    def plot_kwargs(self) -> dict:
        # Reference dataset_evaluator_bair.py:126-128 (density limits; the
        # mean-vector plot there uses tighter (-0.05, 0.05) limits — the
        # density limits are applied to the whole set here).
        return {"xlim": (-0.1, 0.1), "ylim": (-0.1, 0.1),
                "axis_inversion": True}


def make_dataset_evaluator(config, logger, reference_dataset, generated_dataset,
                           **kw) -> DatasetEvaluator:
    return DatasetEvaluator(config, logger, reference_dataset, generated_dataset, **kw)


def make_dataset_evaluator_breakout(config, logger, reference_dataset,
                                    generated_dataset, **kw) -> DatasetEvaluator:
    return DatasetEvaluatorBreakout(config, logger, reference_dataset,
                                    generated_dataset, **kw)


def make_dataset_evaluator_bair(config, logger, reference_dataset,
                                generated_dataset, **kw) -> DatasetEvaluator:
    return DatasetEvaluatorBair(config, logger, reference_dataset,
                                generated_dataset, **kw)
