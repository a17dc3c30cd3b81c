"""Offline evaluation pipeline e2e: detector -> movements -> action
variance -> SVM -> density plots -> data.yml.

Mirrors the reference evaluate_dataset.py flow (SURVEY.md §3.4) on the
synthetic moving-square fixture, with the weight-free motion-blob detector
backend standing in for the reference's Faster R-CNN
(tennis_player_detector.py:14-108).
"""
import os

import numpy as np
import pytest

from playablevideogeneration_tpu.data.synthetic import make_moving_square_video


def _write_eval_datasets(root, videos=2, length=12, size=32, actions=3):
    """Reference + generated dataset pair; generated videos carry the
    builder's `inferred_action` metadata (reference builder.py:87-136)."""
    ref_dir = os.path.join(root, "reference")
    gen_dir = os.path.join(root, "generated")
    rng = np.random.default_rng(0)
    for v in range(videos):
        video = make_moving_square_video(length=length, height=size, width=size,
                                         actions_count=actions, seed=v)
        video.save(os.path.join(ref_dir, f"{v:05d}"))
        gen = make_moving_square_video(length=length, height=size, width=size,
                                       actions_count=actions, seed=v)
        for meta in gen.metadata:
            meta["inferred_action"] = int(rng.integers(0, actions))
        gen.save(os.path.join(gen_dir, f"{v:05d}"))
    return ref_dir, gen_dir


def _eval_config(tmp_path, ref_dir, gen_dir, size=32, length=12, actions=3):
    return {
        "logging": {"run_name": "synthetic_eval",
                    "output_root": str(tmp_path / "eval_out")},
        "data": {"target_input_size": [size, size], "actions_count": actions,
                 "ground_truth_available": True},
        "reference_data": {"data_root": ref_dir, "crop": None},
        "generated_data": {"data_root": gen_dir, "crop": None},
        "evaluation": {
            "evaluator": "evaluation.dataset_evaluator",
            "detector": "blob",
            "batching": {"batch_size": 1, "observations_count": length,
                         "skip_frames": 0, "observation_stacking": 1,
                         "num_workers": 1},
        },
    }


@pytest.mark.slow  # full CLI subprocess: ~25 s on this host
def test_evaluate_dataset_cli_with_blob_detector(tmp_path, monkeypatch):
    from playablevideogeneration_tpu.cli.evaluate_dataset import evaluate_dataset
    from playablevideogeneration_tpu.config.configuration import (
        EvaluationConfiguration,
    )

    monkeypatch.delenv("PVG_PRETRAINED_WEIGHTS", raising=False)
    ref_dir, gen_dir = _write_eval_datasets(str(tmp_path))
    configuration = EvaluationConfiguration(
        config=_eval_config(tmp_path, ref_dir, gen_dir))
    configuration.check_config()
    configuration.create_directory_structure()
    metrics = evaluate_dataset(configuration.get_config())

    # Frame metrics over the full chain.
    assert metrics["mse/avg"] >= 0.0
    assert metrics["psnr/avg"] > 0.0

    # Detection chain is LIVE (not `detection_unavailable`): the motion-blob
    # backend must find the moving square in most frames.
    assert "detection_unavailable" not in metrics
    assert metrics["detection/add/avg"] >= 0.0
    # The tennis court-region filter legitimately rejects square positions
    # near the frame borders of the tiny fixture; a live detector still
    # lands well above zero.
    assert metrics["detection/detection_rate/reference"] >= 0.3

    # Movement/action chain: per-action variance + SVM classification.
    assert "action_space_unavailable" not in metrics
    assert any(k.startswith("action_variance") for k in metrics)
    assert any("classification" in k for k in metrics)

    # Backbone degradation markers (no pretrained weights in this env).
    assert "lpips_unavailable" in metrics
    assert "fid_unavailable" in metrics
    assert "fvd_unavailable" in metrics

    # data.yml written.
    out_dir = configuration.get_config()["logging"]["output_directory"]
    assert os.path.isfile(os.path.join(out_dir, "data.yml"))
    # Density plots produced by the action-space chain.
    plots = [f for f in os.listdir(out_dir) if f.endswith((".png", ".pdf"))]
    assert plots, "expected density plots in the output directory"


def test_blob_detector_tracks_moving_square():
    from playablevideogeneration_tpu.evaluation.metrics.detection import (
        TennisPlayerDetector,
    )

    # Square positions never overlap across frames, so the per-sequence
    # median is the clean background.
    size, square = 48, 4
    xs = [2, 8, 14, 20, 26, 32, 38, 44]
    frames = np.full((len(xs), size, size, 3), 0.1, np.float32)
    for t, x in enumerate(xs):
        # y = 20 keeps every box clear of the tennis court-region filters.
        frames[t, 20:20 + square, x:x + square] = (0.9, 0.2, 0.2)
    detector = TennisPlayerDetector(backend="blob")
    centers = detector(frames[None])  # (1, T, 2)
    assert centers.shape == (1, len(xs), 2)
    ok = centers[0, :, 0] != -1
    assert ok.sum() >= len(xs) - 1
    got_x = centers[0, ok, 0]
    want_x = np.asarray(xs, np.float64)[ok] + square / 2.0
    np.testing.assert_allclose(got_x, want_x, atol=1.5)


def test_court_filter_and_tallest_selection():
    from playablevideogeneration_tpu.evaluation.metrics.detection import (
        select_player_center,
    )

    w, h = 256, 96
    # Scoreboard box in the upper-left and an overlay in the upper-right
    # are filtered out (reference tennis_player_detector.py:34-47).
    boxes = [(5, 5, 50, 20),      # upper-left scoreboard
             (210, 2, 250, 20),   # upper-right overlay
             (100, 80.5, 120, 95),  # starts too low (spectators)
             (100, 30, 110, 60),  # valid, height 30
             (150, 30, 160, 70)]  # valid, height 40 -> tallest wins
    center = select_player_center(boxes, w, h)
    assert center == (155.0, 50.0)
    assert select_player_center([(5, 5, 50, 20)], w, h) == (-1.0, -1.0)


@pytest.mark.slow  # full metric zoo with real backbone graphs: ~27 s
def test_evaluate_dataset_with_plugged_backbones(tmp_path, monkeypatch):
    """With extractor/embedder/lpips backends plugged in (here: cheap
    deterministic stand-ins with the real interfaces), the pipeline
    produces actual FID / FVD / LPIPS numbers instead of markers."""
    import jax.numpy as jnp

    from playablevideogeneration_tpu.cli.evaluate_dataset import evaluate_dataset
    from playablevideogeneration_tpu.config.configuration import (
        EvaluationConfiguration,
    )

    monkeypatch.delenv("PVG_PRETRAINED_WEIGHTS", raising=False)
    ref_dir, gen_dir = _write_eval_datasets(str(tmp_path))
    configuration = EvaluationConfiguration(
        config=_eval_config(tmp_path, ref_dir, gen_dir))
    configuration.check_config()
    configuration.create_directory_structure()

    def fake_fid_extractor(frames):  # (N, H, W, 3) -> (N, D)
        f = np.asarray(frames, np.float64)
        means = f.mean(axis=(1, 2, 3), keepdims=False)
        return np.stack([means, f.var(axis=(1, 2, 3)), f[:, 0, 0, 0],
                         f[:, -1, -1, -1]], axis=1)

    def fake_fvd_embedder(videos):  # (N, T, H, W, 3) -> (N, D)
        v = np.asarray(videos, np.float64)
        return np.stack([v.mean(axis=(1, 2, 3, 4)),
                         v.var(axis=(1, 2, 3, 4))], axis=1)

    def fake_lpips(ref, gen):  # (B, T, H, W, 3) pairs -> (B, T)
        return jnp.mean((ref - gen) ** 2, axis=(2, 3, 4))

    metrics = evaluate_dataset(configuration.get_config(),
                               fid_extractor=fake_fid_extractor,
                               fvd_embedder=fake_fvd_embedder,
                               lpips_fn=fake_lpips)
    # Identical frame statistics -> Fréchet distances are zero up to fp
    # error (which may land a hair negative).
    assert np.isfinite(metrics["fid"]) and metrics["fid"] >= -1e-6
    assert np.isfinite(metrics["fvd"]) and metrics["fvd"] >= -1e-6
    assert np.isfinite(metrics["lpips/avg"])
    for marker in ("fid_unavailable", "fvd_unavailable", "lpips_unavailable"):
        assert marker not in metrics


def test_inception_score_wiring(tmp_path, monkeypatch):
    """evaluation.compute_inception_score reports IS when a classifier
    backend is plugged; records a marker otherwise."""
    from playablevideogeneration_tpu.cli.evaluate_dataset import evaluate_dataset
    from playablevideogeneration_tpu.config.configuration import (
        EvaluationConfiguration,
    )

    monkeypatch.delenv("PVG_PRETRAINED_WEIGHTS", raising=False)
    ref_dir, gen_dir = _write_eval_datasets(str(tmp_path), videos=1)
    cfg = _eval_config(tmp_path, ref_dir, gen_dir)
    cfg["evaluation"]["compute_inception_score"] = True
    cfg["evaluation"]["detector"] = "none"
    configuration = EvaluationConfiguration(config=cfg)
    configuration.check_config()
    configuration.create_directory_structure()

    def fake_class_probs(frames):  # (N, H, W, 3) -> (N, classes)
        n = np.asarray(frames).shape[0]
        probs = np.full((n, 4), 0.25)
        return probs

    metrics = evaluate_dataset(configuration.get_config(),
                               class_probability_fn=fake_class_probs)
    assert np.isclose(metrics["inception_score"], 1.0, atol=1e-6)

    metrics2 = evaluate_dataset(configuration.get_config())
    assert "inception_score_unavailable" in metrics2


def test_bair_evaluator_metadata_states(tmp_path, monkeypatch):
    """BAIR protocol: movements come from REFERENCE metadata 'state'
    vectors (any dimensionality — real BAIR arm states are 4-D), the
    generated dataset has no states, and — like the reference
    dataset_evaluator_bair.py — NO detection metric is computed (feeding
    (N,T,4) reference states against the (N,T,2) generated placeholder
    used to crash or fabricate an all-missed detection result)."""
    from playablevideogeneration_tpu.cli.evaluate_dataset import evaluate_dataset
    from playablevideogeneration_tpu.config.configuration import (
        EvaluationConfiguration,
    )

    monkeypatch.delenv("PVG_PRETRAINED_WEIGHTS", raising=False)
    ref_dir, gen_dir = _write_eval_datasets(str(tmp_path))
    # Attach 4-D arm states to the REFERENCE videos only.
    from playablevideogeneration_tpu.data.video import Video

    rng = np.random.default_rng(3)
    for name in os.listdir(ref_dir):
        path = os.path.join(ref_dir, name)
        video = Video()
        video.load(path)
        for meta in video.metadata:
            meta["state"] = rng.normal(size=4).tolist()
        video.save(path)

    config = _eval_config(tmp_path, ref_dir, gen_dir)
    config["evaluation"]["evaluator"] = "evaluation.dataset_evaluator_bair"
    del config["evaluation"]["detector"]
    configuration = EvaluationConfiguration(config=config)
    configuration.check_config()
    configuration.create_directory_structure()
    metrics = evaluate_dataset(configuration.get_config())

    # No detection metric for BAIR — explicit marker, no bogus numbers.
    assert "detection_unavailable" in metrics
    assert "detection/add/avg" not in metrics
    # Movement/action chain fed by the 4-D metadata states.
    assert "action_space_unavailable" not in metrics
    assert any(k.startswith("action_variance") for k in metrics)
