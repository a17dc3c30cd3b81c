"""Metric zoo tests: frame metrics, Fréchet math, detection, action metrics."""
import numpy as np
import jax.numpy as jnp
import pytest

from playablevideogeneration_tpu.evaluation.metrics import frame_metrics
from playablevideogeneration_tpu.evaluation.metrics.action_metrics import (
    action_classification_score,
    action_variance,
)
from playablevideogeneration_tpu.evaluation.metrics.detection import (
    breakout_platform_positions,
    detection_metric,
)
from playablevideogeneration_tpu.evaluation.metrics.fid import (
    compute_statistics_from_frames,
    fid_from_statistics,
)


def _pair(seed=0, b=2, t=3, h=16, w=16):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, size=(b, t, h, w, 3)).astype(np.float32)
    bb = np.clip(a + rng.normal(0, 0.1, size=a.shape), 0, 1).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(bb)


def test_mse_psnr_shapes_and_identity():
    a, b = _pair()
    assert frame_metrics.mse(a, b).shape == (2, 3)
    np.testing.assert_allclose(np.asarray(frame_metrics.mse(a, a)), 0.0, atol=1e-7)
    # PSNR of identical images is very large; of noisy pair ~20 dB
    psnr = np.asarray(frame_metrics.psnr(a, b))
    assert (psnr > 15).all() and (psnr < 30).all()
    # Manual check: PSNR = -10 log10(mse)
    mse = np.asarray(frame_metrics.mse(a, b))
    np.testing.assert_allclose(psnr, -10 * np.log10(mse), rtol=1e-4)


def test_ssim_bounds_and_identity():
    a, b = _pair(1, h=32, w=32)
    s_id = np.asarray(frame_metrics.ssim(a, a))
    np.testing.assert_allclose(s_id, 1.0, atol=1e-4)
    s = np.asarray(frame_metrics.ssim(a, b))
    assert (s < 1.0).all() and (s > 0.0).all()
    # Anticorrelated images score lower than noisy copies
    s_inv = np.asarray(frame_metrics.ssim(a, 1.0 - a))
    assert (s_inv < s).all()


def test_motion_masked_mse():
    a, b = _pair(2)
    v = np.asarray(frame_metrics.motion_masked_mse(a, b))
    assert v.shape == (2, 3)
    assert np.isfinite(v).all()
    np.testing.assert_allclose(
        np.asarray(frame_metrics.motion_masked_mse(a, a)), 0.0, atol=1e-7)


def test_frechet_distance_identical_zero():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 8))
    mu, sigma = x.mean(0), np.cov(x, rowvar=False)
    assert abs(fid_from_statistics(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_mean_shift():
    # For equal covariances, FID = ||mu1 - mu2||^2
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2000, 4))
    mu, sigma = x.mean(0), np.cov(x, rowvar=False)
    shift = np.asarray([1.0, 0, 0, 0])
    d = fid_from_statistics(mu, sigma, mu + shift, sigma)
    assert abs(d - 1.0) < 1e-6


def test_fid_streaming_statistics_match_direct():
    rng = np.random.default_rng(2)
    frames = rng.uniform(size=(30, 8, 8, 3)).astype(np.float32)

    def extractor(x):
        return x.reshape(x.shape[0], -1)[:, :10]

    mu, sigma = compute_statistics_from_frames(
        extractor, [frames[:13], frames[13:]])
    acts = extractor(frames)
    np.testing.assert_allclose(mu, acts.mean(0), rtol=1e-5)
    np.testing.assert_allclose(sigma, np.cov(acts, rowvar=False),
                               rtol=1e-4, atol=1e-7)


def test_detection_metric():
    ref = np.array([[[0.0, 0], [1, 1], [-1, -1]],
                    [[2.0, 2], [3, 3], [4, 4]]])
    gen = np.array([[[0.0, 1], [1, 1], [5, 5]],
                    [[2.0, 2], [-1, -1], [4, 4]]])
    results = detection_metric(ref, gen, "det")
    # Position 0: both detected in both sequences; distances 1 and 0 -> 0.5
    assert abs(results["det/add/0"] - 0.5) < 1e-9
    assert results["det/mdr/0"] == 0.0
    # Position 1: seq1 ok (d=0), seq2 generated missing -> mdr = 0.5
    assert results["det/mdr/1"] == 0.5
    # Position 2: reference missing in seq0 -> only seq1 counted
    assert results["det/add/2"] == 0.0


def test_breakout_platform_detector():
    obs = np.zeros((1, 2, 100, 60, 3), np.float32)
    # Paint a red platform band near the bottom at x in [20, 30)
    obs[0, 0, 90:96, 20:30, 0] = 0.8
    obs[0, 1, 90:96, 40:50, 0] = 0.8
    pos = breakout_platform_positions(obs)
    assert pos.shape == (1, 2, 1)
    assert abs(pos[0, 0, 0] - 24.5) < 1.0
    assert abs(pos[0, 1, 0] - 44.5) < 1.0


def test_action_variance_statistics():
    actions = np.array([0, 1, 0, 1])
    vectors = np.array([[1.0, 0], [0, 1], [3.0, 0], [0, 3]])
    results = action_variance(actions, vectors, 2)
    np.testing.assert_allclose(results["action_variance/mean_vector/0"], [2.0, 0.0])
    np.testing.assert_allclose(results["action_variance/variance_vector/0"], [1.0, 0.0])
    assert abs(results["action_variance/frequency/0"] - 0.5) < 1e-9
    assert "action_variance/avg_variance/mean" in results


def test_action_classification_separable():
    rng = np.random.default_rng(3)
    n = 40
    actions = np.concatenate([np.zeros(n, int), np.ones(n, int)])
    vectors = np.concatenate([
        rng.normal([-2, 0], 0.2, size=(n, 2)),
        rng.normal([2, 0], 0.2, size=(n, 2)),
    ])
    results = action_classification_score(actions, vectors, 2)
    assert results["action_classification/linear/accuracy"] > 0.95
    assert results["action_classification/rbf/accuracy"] > 0.95


def test_positional_statistics():
    from playablevideogeneration_tpu.evaluation.dataset_evaluator import (
        compute_positional_statistics)

    values = np.array([[1.0, 2.0], [3.0, 4.0]])
    r = compute_positional_statistics(values, "m")
    assert r["m/0"] == 2.0 and r["m/1"] == 3.0
    assert r["m/avg"] == 2.5
    assert r["m/0/var"] == 1.0


def test_inception_score_bounds():
    from playablevideogeneration_tpu.evaluation.metrics.inception import (
        inception_score,
    )

    # Uniform conditionals equal the marginal -> IS = 1.
    uniform = np.full((40, 5), 0.2)
    mean, std = inception_score(uniform, splits=2)
    assert np.isclose(mean, 1.0, atol=1e-6)
    # Confident, balanced conditionals -> IS = number of classes.
    eye = np.tile(np.eye(5), (8, 1))
    mean, _ = inception_score(eye, splits=2)
    assert np.isclose(mean, 5.0, rtol=1e-3)


def test_results_plotter_curves(tmp_path):
    import yaml

    from playablevideogeneration_tpu.evaluation.plotting import results_plotter

    results = {"mse/avg": 0.5, "mse/0": 0.1, "mse/1": 0.2, "mse/2": 0.3,
               "psnr/0": 30.0}
    path = str(tmp_path / "data.yml")
    with open(path, "w") as f:
        yaml.safe_dump(results, f)
    curve = results_plotter.positional_curve(results, "mse")
    np.testing.assert_allclose(curve, [0.1, 0.2, 0.3])
    assert results_plotter.positional_curve(results, "ssim") is None

    out = str(tmp_path / "plots")
    results_plotter.plot_metric_curves([path], ["run"], ["mse", "psnr"], out)
    import os
    assert os.path.isfile(os.path.join(out, "mse.pdf"))


def test_ssim_matches_independent_reference_implementation():
    """Golden parity: SSIM vs an independent numpy/scipy implementation of
    Wang et al. with the piq defaults (gaussian 11x11 sigma 1.5, valid
    windows, biased covariances) — the reference computes SSIM via piq
    (dataset_evaluator.py:64)."""
    from scipy.ndimage import convolve

    from playablevideogeneration_tpu.evaluation.metrics import frame_metrics

    rng = np.random.default_rng(11)
    ref = rng.uniform(0, 1, (1, 2, 24, 24, 3)).astype(np.float32)
    gen = np.clip(ref + rng.normal(0, 0.08, ref.shape), 0, 1).astype(np.float32)

    got = np.asarray(frame_metrics.ssim(jnp.asarray(ref), jnp.asarray(gen)))

    # Independent implementation.
    half = 5
    coords = np.arange(11) - half
    g = np.exp(-(coords**2) / (2 * 1.5**2))
    g /= g.sum()
    window = np.outer(g, g)

    def valid_filter(img):
        out = convolve(img, window, mode="constant")
        return out[half:-half, half:-half]

    c1, c2 = 0.01**2, 0.03**2
    want = np.zeros_like(got)
    for b in range(ref.shape[0]):
        for t in range(ref.shape[1]):
            per_channel = []
            for c in range(3):
                x, y = ref[b, t, :, :, c].astype(np.float64), \
                    gen[b, t, :, :, c].astype(np.float64)
                mx, my = valid_filter(x), valid_filter(y)
                sx = valid_filter(x * x) - mx * mx
                sy = valid_filter(y * y) - my * my
                sxy = valid_filter(x * y) - mx * my
                smap = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
                    (mx * mx + my * my + c1) * (sx + sy + c2))
                per_channel.append(smap.mean())
            want[b, t] = np.mean(per_channel)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fid_cli_paths_and_stats(tmp_path, monkeypatch, capsys):
    """Path-based FID CLI (reference pytorch_fid/fid_score.py:217-251):
    image directories and .npz statistics inputs, --save-stats output,
    mixed-resolution batching.  The Inception extractor is stubbed with a
    cheap deterministic feature map — the real backbone has its own
    oracle-parity tests."""
    from PIL import Image

    from playablevideogeneration_tpu.cli import fid as fid_cli

    rng = np.random.default_rng(0)

    def write_images(directory, n, base, size=12):
        directory.mkdir()
        for i in range(n):
            img = np.clip(base + rng.integers(0, 40, (size, size, 3)),
                          0, 255).astype(np.uint8)
            Image.fromarray(img).save(directory / f"{i:03d}.png")

    dir_a, dir_b = tmp_path / "a", tmp_path / "b"
    write_images(dir_a, 5, base=30)
    write_images(dir_b, 5, base=160)

    def fake_extractor(frames):
        frames = np.asarray(frames)
        n = frames.shape[0]
        flat = frames.reshape(n, -1)
        return np.stack([flat.mean(1), flat.std(1), flat.max(1),
                         flat.min(1)], axis=1)

    monkeypatch.setattr("playablevideogeneration_tpu.utils.pretrained."
                        "get_fid_extractor", lambda config: fake_extractor)

    fid_cli.main([str(dir_a), str(dir_b), "--batch-size", "2", "--quiet"])
    out = capsys.readouterr().out
    assert out.startswith("FID: ")
    cross = float(out.split("FID: ")[1])
    assert np.isfinite(cross) and cross > 0

    # Identical distributions -> FID 0.
    fid_cli.main([str(dir_a), str(dir_a), "--quiet"])
    same = float(capsys.readouterr().out.split("FID: ")[1])
    assert same == pytest.approx(0.0, abs=1e-6)

    # --save-stats roundtrip: cached statistics give the same distance.
    stats = tmp_path / "stats" / "a.npz"
    fid_cli.main(["--save-stats", str(dir_a), str(stats), "--quiet"])
    capsys.readouterr()
    assert stats.is_file()
    fid_cli.main([str(stats), str(dir_b), "--quiet"])
    from_stats = float(capsys.readouterr().out.split("FID: ")[1])
    assert from_stats == pytest.approx(cross, rel=1e-9)

    # Mixed resolutions split batches instead of crashing.
    Image.fromarray(np.full((20, 20, 3), 30, np.uint8)).save(
        dir_a / "zzz_big.png")
    fid_cli.main([str(dir_a), str(dir_b), "--quiet"])
    assert np.isfinite(float(capsys.readouterr().out.split("FID: ")[1]))


def test_fid_cli_requires_weights_for_image_paths(tmp_path, monkeypatch):
    from PIL import Image

    from playablevideogeneration_tpu.cli import fid as fid_cli

    d = tmp_path / "imgs"
    d.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "0.png")
    monkeypatch.setattr("playablevideogeneration_tpu.utils.pretrained."
                        "get_fid_extractor", lambda config: None)
    with pytest.raises(SystemExit, match="No FID InceptionV3 weights"):
        fid_cli.main([str(d), str(d)])
    # Two .npz statistics files need no backbone at all.
    np.savez(tmp_path / "s1.npz", mu=np.zeros(4), sigma=np.eye(4))
    np.savez(tmp_path / "s2.npz", mu=np.ones(4), sigma=np.eye(4))
    fid_cli.main([str(tmp_path / "s1.npz"), str(tmp_path / "s2.npz")])
