"""Data layer tests: Video format round-trip, dataset index math, loader."""
import os
import pickle

import numpy as np
import pytest

from playablevideogeneration_tpu.data.loader import DataLoader
from playablevideogeneration_tpu.data.synthetic import (
    build_synthetic_dataset,
    make_moving_square_video,
)
from playablevideogeneration_tpu.data.transforms import (
    make_evaluation_transform,
    make_train_transform,
)
from playablevideogeneration_tpu.data.video import Video
from playablevideogeneration_tpu.data.video_dataset import VideoDataset, collate


def test_video_save_load_roundtrip(tmp_path):
    video = make_moving_square_video(length=8, height=24, width=24, seed=3)
    path = str(tmp_path / "v0")
    video.save(path)
    # On-disk format: zero-padded frames + 4 pickles (reference video.py:15-18).
    files = sorted(os.listdir(path))
    assert "00000.png" in files and "00007.png" in files
    for pkl in ("actions.pkl", "rewards.pkl", "metadata.pkl", "dones.pkl"):
        assert pkl in files
    with open(os.path.join(path, "actions.pkl"), "rb") as f:
        actions = pickle.load(f)
    assert len(actions) == 8

    loaded = Video().load(path)
    assert loaded.get_frames_count() == 8
    assert loaded.actions == video.actions
    assert loaded.metadata[0]["state"] == video.metadata[0]["state"]
    frame = loaded.get_frame_at(0)
    np.testing.assert_array_equal(np.asarray(frame), np.asarray(video.get_frame_at(0)))


def test_dataset_sample_counts(synthetic_dataset_dir):
    cfg = {"observations_count": 5, "observation_stacking": 2, "skip_frames": 0}
    t = make_train_transform(None, (32, 32))
    ds = VideoDataset(os.path.join(synthetic_dataset_dir, "train"), cfg, t)
    # Each 16-frame video yields 16 - 5 + 1 = 12 samples; 2 videos.
    assert len(ds) == 24

    ds.set_observations_count(3)
    assert len(ds) == 28  # 14 per video

    sample = ds[0]
    assert sample.observations.shape == (3, 32, 32, 6)
    assert sample.actions.shape == (3,)
    # Frames are normalized to [-1, 1].
    assert sample.observations.min() >= -1.0 and sample.observations.max() <= 1.0


def test_dataset_stacking_clamps_at_start(synthetic_dataset_dir):
    cfg = {"observations_count": 2, "observation_stacking": 3, "skip_frames": 0}
    t = make_train_transform(None, (32, 32))
    ds = VideoDataset(os.path.join(synthetic_dataset_dir, "train"), cfg, t)
    s = ds[0]  # starts at frame 0
    # Observation 0 stacks frames [0, 0, 0] (clamped): all three identical.
    obs0 = s.observations[0]
    np.testing.assert_array_equal(obs0[..., 0:3], obs0[..., 3:6])
    np.testing.assert_array_equal(obs0[..., 3:6], obs0[..., 6:9])
    # Observation 1 stacks frames [1, 0, 0]: newest-first.
    obs1 = s.observations[1]
    np.testing.assert_array_equal(obs1[..., 3:6], obs0[..., 0:3])
    # Order sensitivity (the asserts above also hold oldest-first when
    # frames coincide): a video of strictly DISTINCT constant-value
    # frames pins newest-first stacking unambiguously.
    from playablevideogeneration_tpu.data.video import Video

    values = [10, 90, 170, 250]
    frames = [np.full((32, 32, 3), v, np.uint8) for v in values]
    video = Video().add_content(frames, [0] * 4, [0.0] * 4,
                                [{} for _ in values], [False] * 3 + [True])
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        video.save(os.path.join(root, "00000"))
        cfg2 = {"observations_count": 4, "observation_stacking": 3,
                "skip_frames": 0}
        ds2 = VideoDataset(root, cfg2, t)
        s2 = ds2[0]
        # Observation 1 = frames [1, 0, 0] newest-first: channel group 0
        # must carry frame VALUE 1, groups 1-2 frame value 0.
        def group_value(obs, g):
            return float(obs[..., 3 * g : 3 * g + 3].mean())

        v1, v0 = group_value(s2.observations[1], 0), group_value(
            s2.observations[1], 1)
        assert v1 > v0, "stacking regressed to oldest-first"
        # Observation 3 stacks frames [3, 2, 1].
        vals = [group_value(s2.observations[3], g) for g in range(3)]
        assert vals[0] > vals[1] > vals[2]


def test_skip_frames_spacing(tmp_path):
    video = make_moving_square_video(length=12, height=16, width=16, seed=5)
    video.save(str(tmp_path / "v"))
    cfg = {"observations_count": 3, "observation_stacking": 1, "skip_frames": 1}
    t = make_evaluation_transform(None, (16, 16))
    ds = VideoDataset(str(tmp_path), cfg, t)
    # block = 3 + 2*1 = 5 frames -> 12 - 5 + 1 = 8 samples
    assert len(ds) == 8
    s = ds[0]
    # Observations are frames 0, 2, 4.
    expected = [np.asarray(video.get_frame_at(i), np.float32) / 255.0 for i in (0, 2, 4)]
    for i, e in enumerate(expected):
        np.testing.assert_allclose(s.observations[i], e, atol=1e-6)
    # Actions come from the observed frames.
    assert list(s.actions) == [video.actions[0], video.actions[2], video.actions[4]]


def test_loader_shapes_and_drop_last(synthetic_dataset_dir):
    cfg = {"observations_count": 4, "observation_stacking": 1, "skip_frames": 0}
    t = make_train_transform(None, (32, 32))
    ds = VideoDataset(os.path.join(synthetic_dataset_dir, "train"), cfg, t)
    loader = DataLoader(ds, batch_size=5, shuffle=True, drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 5
    for batch in batches:
        assert batch.observations.shape == (5, 4, 32, 32, 3)
        assert batch.actions.shape == (5, 4)
        assert batch.actions.dtype == np.int32


def test_loader_deterministic_collate(synthetic_dataset_dir):
    cfg = {"observations_count": 4, "observation_stacking": 1, "skip_frames": 0}
    t = make_train_transform(None, (32, 32))
    ds = VideoDataset(os.path.join(synthetic_dataset_dir, "train"), cfg, t)
    direct = collate([ds[0], ds[1]])
    assert direct.observations.shape == (2, 4, 32, 32, 3)
    assert direct.initial_frames == [0, 1]


def test_transforms_crop_and_resize():
    from PIL import Image

    img = Image.fromarray(np.arange(32 * 32 * 3, dtype=np.uint8).reshape(32, 32, 3))
    t = make_train_transform([0, 0, 16, 16], (8, 8))
    out = t(img)
    assert out.shape == (8, 8, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    t_eval = make_evaluation_transform(None, (32, 32))
    out_eval = t_eval(img)
    assert out_eval.min() >= 0.0 and out_eval.max() <= 1.0


def test_sample_augmentation_transform():
    """Random-affine augmentation sampler (reference transforms.py:39-64):
    identity parameters are a no-op, pure translation moves content by the
    sampled offset, and one sampled transform applies the SAME effect to
    every frame."""
    import random

    from PIL import Image

    from playablevideogeneration_tpu.data.transforms import (
        sample_augmentation_transform,
    )

    img = np.zeros((32, 32, 3), np.uint8)
    img[10:14, 6:10] = 255
    pil = Image.fromarray(img)

    identity_cfg = {"rotation_range": (0, 0), "translation_range": (0, 0),
                    "scale_range": (1.0, 1.0)}
    out = np.asarray(sample_augmentation_transform(identity_cfg)(pil))
    np.testing.assert_array_equal(out, img)

    shift_cfg = {"rotation_range": (0, 0), "translation_range": (5, 5),
                 "scale_range": (1.0, 1.0)}
    t = sample_augmentation_transform(shift_cfg)
    shifted = np.asarray(t(pil))
    # Positive translation moves image content down-right by 5 px
    # (torchvision.functional.affine semantics).
    np.testing.assert_array_equal(shifted[15:19, 11:15], 255)
    assert shifted[10:14, 6:10].max() == 0
    # Consistency: the same sampled transform moves a DIFFERENT frame's
    # content by the same offset.
    img2 = np.zeros((32, 32, 3), np.uint8)
    img2[2:4, 20:22] = 128
    shifted2 = np.asarray(t(Image.fromarray(img2)))
    np.testing.assert_array_equal(shifted2[7:9, 25:27], 128)

    # Seeded rng makes the sampled parameters reproducible.
    wide_cfg = {"rotation_range": (-30, 30), "translation_range": (-8, 8),
                "scale_range": (0.8, 1.2)}
    a = sample_augmentation_transform(wide_cfg, rng=random.Random(7))(pil)
    b = sample_augmentation_transform(wide_cfg, rng=random.Random(7))(pil)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # 180-degree rotation about the center maps the square to its point
    # reflection (rows 10:14, cols 6:10 -> rows 18:22, cols 22:26).
    rot_cfg = {"rotation_range": (180, 180), "translation_range": (0, 0),
               "scale_range": (1.0, 1.0)}
    rotated = np.asarray(sample_augmentation_transform(rot_cfg)(pil))
    assert rotated[19:21, 23:25].min() == 255


def test_splitter_flat_and_splitted(tmp_path):
    from playablevideogeneration_tpu.data.splitter import generate_splits

    flat_root = str(tmp_path / "flat")
    build_synthetic_dataset(flat_root, videos_per_split=10, length=4,
                            height=16, width=16, flat=True)
    config = {
        "data": {"data_root": flat_root, "dataset_style": "flat",
                 "dataset_splits": [0.6, 0.2, 0.2]},
        "training": {"batching": {"a": 1}},
        "evaluation": {"batching": {"b": 2}},
    }
    splits = generate_splits(config)
    assert len(splits["train"][2]) == 6
    assert len(splits["validation"][2]) == 2
    assert len(splits["test"][2]) == 2
    assert splits["train"][2].isdisjoint(splits["test"][2])

    config["data"]["dataset_style"] = "splitted"
    splits = generate_splits(config)
    assert splits["train"][0].endswith("train")
    assert splits["validation"][0].endswith("val")


def test_loader_process_mode_matches_thread_mode(synthetic_dataset_dir):
    batching = {"batch_size": 2, "observations_count": 4, "skip_frames": 0,
                "observation_stacking": 1, "num_workers": 2}
    transform = make_train_transform(None, (32, 32))
    dataset = VideoDataset(synthetic_dataset_dir + "/train", batching, transform)

    def batches(mode):
        loader = DataLoader(dataset, batch_size=2, shuffle=False,
                            drop_last=True, num_workers=2, worker_mode=mode)
        return list(loader)

    thread_batches = batches("thread")
    process_batches = batches("process")
    assert len(thread_batches) == len(process_batches) > 0
    for tb, pb in zip(thread_batches, process_batches):
        np.testing.assert_array_equal(tb.observations, pb.observations)
        np.testing.assert_array_equal(tb.actions, pb.actions)
        assert pb.videos == []  # arrays only across the process boundary


def test_loader_process_sharding_is_disjoint_and_complete(synthetic_dataset_dir):
    batching = {"batch_size": 1, "observations_count": 4, "skip_frames": 0,
                "observation_stacking": 1, "num_workers": 1}
    transform = make_train_transform(None, (32, 32))
    dataset = VideoDataset(synthetic_dataset_dir + "/train", batching, transform)

    seen = []
    for shard in range(2):
        loader = DataLoader(dataset, batch_size=1, shuffle=True, drop_last=True,
                            num_workers=1, seed=7, shard_index=shard,
                            shard_count=2)
        # Exact sample identity: (video directory, start frame) — pixel
        # bytes are NOT unique (the square can revisit positions).
        idents = [(b.videos[0].root, b.initial_frames[0]) for b in loader]
        assert len(loader) == len(dataset) // 2
        assert len(set(idents)) == len(idents)  # no duplicates in-shard
        seen.append(set(idents))
    # Same-seed shuffles on each process produce DISJOINT strided shards
    # whose union covers the (truncated) epoch — the invariant that makes
    # 2-host training see every sample exactly once.
    assert not (seen[0] & seen[1]), \
        "shards overlap: both hosts would train on the same samples"
    full = {(b.videos[0].root, b.initial_frames[0])
            for b in DataLoader(dataset, batch_size=1, shuffle=True,
                                drop_last=True, num_workers=1, seed=7)}
    assert (seen[0] | seen[1]) <= full
    assert len(seen[0] | seen[1]) == (len(dataset) // 2) * 2


def test_video_saver_timecoded_resampling(tmp_path):
    import os

    import numpy as np

    from playablevideogeneration_tpu.utils.video_saver import VideoSaver

    saver = VideoSaver(framerate=10)
    frames = np.stack([np.full((8, 8, 3), v, np.uint8) for v in (10, 20, 30)])
    # Frame 2 is on screen 0.2 s -> twice as many ticks as frame 1.
    out = saver.save_video_timecoded(frames, [0.0, 0.1, 0.3],
                                     str(tmp_path / "tc.mp4"),
                                     actions=[0, 1, 2])
    if saver.available:
        assert os.path.isfile(out)
    else:  # PNG fallback directory, one file per resampled tick
        files = sorted(os.listdir(out))
        assert len(files) == 4  # 1 + 2 + 1 ticks at 10 fps


def test_loader_uneven_shards_truncate_to_equal_counts():
    """Uneven dataset / shard_count: every shard must yield the SAME number
    of batches (a longer shard would deadlock multi-host collectives)."""
    from playablevideogeneration_tpu.data.loader import DataLoader

    class _Stub:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            raise AssertionError("index access not needed")

    lengths = []
    for shard in range(2):
        loader = DataLoader(_Stub(), batch_size=1, shuffle=False,
                            drop_last=True, num_workers=1,
                            shard_index=shard, shard_count=2)
        idxs = list(loader._batch_indices())
        lengths.append(len(idxs))
        assert len(loader) == len(idxs)
    assert lengths[0] == lengths[1] == 5


def test_synthetic_action_convention_matches_evaluator_labels():
    """actions[t] must cause the transition t -> t+1 (the gym-recording
    convention the reference evaluator's Hungarian labels assume,
    reference evaluator.py:207: transitions are labeled actions[:, :-1]).
    A label shift here silently floors the accuracy metric at chance."""
    v = make_moving_square_video(length=48, height=48, width=48,
                                 actions_count=3, seed=5, step_pixels=4)
    states = np.asarray([m["state"] for m in v.metadata])
    moves = states[1:] - states[:-1]
    acts = np.asarray(v.actions)[:-1]  # evaluator's transition labels
    motion_label = np.where(moves[:, 0] > 0, 2,
                            np.where(moves[:, 0] < 0, 1, 0))
    # Wherever the square actually moved, the motion must match the
    # transition's action label exactly.
    moving = moves[:, 0] != 0
    assert moving.any()
    np.testing.assert_array_equal(motion_label[moving], acts[moving])
    # Border clamps make some 'left'/'right' actions motionless, but
    # overall consistency stays far above chance.
    assert (motion_label == acts).mean() > 0.8


def test_input_helper_line_fallback_and_raw_translation():
    """InputHelper (reference utils/input_helper.py:4): non-tty streams fall
    back to line-buffered reads returning one character; EOF yields ''."""
    import io

    from playablevideogeneration_tpu.utils.input_helper import InputHelper

    helper = InputHelper(interactive=True, stream=io.StringIO("3\nq\n"))
    assert not helper.interactive  # StringIO is not a tty -> fallback mode
    assert helper.read_character() == "3"
    assert helper.read_character() == "q"
    assert helper.read_character() == ""  # EOF

    # A blank line is a real (newline) keypress, not EOF.
    helper = InputHelper(interactive=False, stream=io.StringIO("\n7\n"))
    assert helper.read_character() == "\n"
    assert helper.read_character() == "7"


def test_interactive_loop_drives_session_via_input_helper(tmp_path):
    """cli.play.interactive_loop reads keys through InputHelper (reference
    play.py:138-201 key map): digits 1..N step the session with action
    key-1, invalid keys are ignored, and 'q'/EOF exits the loop."""
    import io

    import numpy as np

    from playablevideogeneration_tpu.cli.play import interactive_loop
    from playablevideogeneration_tpu.utils.input_helper import InputHelper
    from playablevideogeneration_tpu.utils.logging import Logger

    class FakeSession:
        def __init__(self):
            self.actions = []

        def generate_next_u8(self, action):
            self.actions.append(action)
            return np.zeros((8, 8, 3), dtype=np.uint8)

    session = FakeSession()
    # keys: action 1, junk (ignored), out-of-range 9 (ignored), action 3,
    # then EOF terminates without needing an explicit 'q'.
    helper = InputHelper(stream=io.StringIO("1\nx\n9\n3\n"))
    interactive_loop(session, Logger(), str(tmp_path), actions_count=3,
                     input_helper=helper)
    assert session.actions == [0, 2]
