"""Interactive playable-video generation.

Reference: play.py:30-211 — OpenCV fullscreen window with number-key
actions, saving PNG frames + mp4 variants + pickle metadata per session.

The TPU-native rewrite separates the device-resident jitted play step
(inference/play_session.py) from three front ends:
  - `--window`: OpenCV window with number-key actions and x10 zoom
    (reference parity; needs a display);
  - `--interactive`: terminal UI reading action keys from stdin
    (headless fallback), saving each session as PNG frames + metadata
    pickle (and mp4 variants when ffmpeg is present);
  - default: scripted rollout of random actions as one device program,
    reporting throughput.
"""
from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np

from playablevideogeneration_tpu.config import registry
from playablevideogeneration_tpu.config.configuration import Configuration
from playablevideogeneration_tpu.data.splitter import generate_splits
from playablevideogeneration_tpu.data.transforms import get_final_transforms
from playablevideogeneration_tpu.data.video_dataset import VideoDataset, collate
from playablevideogeneration_tpu.inference.play_session import (
    PlaySession,
    frame_to_uint8,
)
from playablevideogeneration_tpu.utils.input_helper import InputHelper
from playablevideogeneration_tpu.utils.logging import Logger
from playablevideogeneration_tpu.utils.video_saver import VideoSaver


def load_play_session(config_dict, noise: bool = False,
                      reference_checkpoint: str = None):
    """Builds the model, restores the checkpoint and picks a start
    observation from the validation set (reference play.py:38-101).

    `reference_checkpoint` imports weights from a reference PyTorch
    .pth.tar (the released CADDY checkpoints) instead of an orbax
    checkpoint."""
    registry._register_defaults()
    logger = Logger(config_dict)
    model_factory = registry.resolve("model", config_dict["model"]["architecture"])
    model = model_factory(config_dict)

    transforms = get_final_transforms(config_dict)
    splits = generate_splits(config_dict)
    path, batching, allowed = splits["validation"]
    dataset = VideoDataset(path, batching, transforms["validation"],
                           allowed_videos=allowed)

    trainer_factory = registry.resolve("trainer", config_dict["training"]["trainer"])
    trainer = trainer_factory(config_dict, model, dataset, logger)
    trainer.init_state(collate([dataset[0]]))
    if reference_checkpoint:
        trainer.load_reference_weights(reference_checkpoint)
    else:
        trainer.load_checkpoint()
        logger.print(f"- Loaded checkpoint at step {trainer.global_step}")

    rng = np.random.default_rng(int(time.time()))
    sample = dataset[int(rng.integers(0, len(dataset)))]
    t = int(rng.integers(0, sample.observations.shape[0]))
    observation = sample.observations[t]

    session = PlaySession(model, trainer.state.variables(), noise=noise)
    session.start(observation)
    return session, observation, logger


def save_session(frames, actions, output_dir: str, logger: Logger,
                 timestamps=None):
    """Saves a play session: PNGs + metadata pickle + the reference's four
    mp4 variants — plain, action-overlay, timecoded, timecoded+overlay
    (reference play.py:182-198, save_video_ffmpeg.py:16-170)."""
    if not frames:
        logger.print("- Nothing to save: no frames recorded")
        return
    os.makedirs(output_dir, exist_ok=True)
    from PIL import Image

    for i, frame in enumerate(frames):
        Image.fromarray(frame_to_uint8(frame)).save(
            os.path.join(output_dir, f"{i:05d}.png"))
    with open(os.path.join(output_dir, "session.pkl"), "wb") as f:
        pickle.dump({"actions": actions, "timestamps": timestamps}, f)
    saver = VideoSaver()
    if saver.available:
        stacked = np.stack([frame_to_uint8(f) for f in frames])
        saver.save_video(stacked, os.path.join(output_dir, "session.mp4"))
        saver.save_video_with_actions(
            stacked, actions, os.path.join(output_dir, "session_actions.mp4"))
        if timestamps is not None and len(timestamps) == len(frames):
            saver.save_video_timecoded(
                stacked, timestamps,
                os.path.join(output_dir, "session_timecoded.mp4"))
            saver.save_video_timecoded(
                stacked, timestamps,
                os.path.join(output_dir, "session_timecoded_actions.mp4"),
                actions=actions)
    logger.print(f"- Session saved to {output_dir}")


class SessionRecorder:
    """Shared session bookkeeping for the interactive front ends: records
    (frame, action, timestamp) triples, saves on demand, and RESTARTS the
    generation state on reset (the reference starts a fresh inference
    session after saving, play.py:182-198)."""

    def __init__(self, session: PlaySession, observation, logger: Logger,
                 output_dir: str):
        self.session = session
        self.observation = observation
        self.logger = logger
        self.output_dir = output_dir
        self.frames, self.actions, self.timestamps = [], [], []

    def step(self, action: int):
        """Generates one frame for `action`; returns (uint8 frame, ms)."""
        start = time.perf_counter()
        # Device-side uint8 conversion: the interactive path is bounded by
        # the frame readback, not the model compute.
        frame = self.session.generate_next_u8(action)
        latency = (time.perf_counter() - start) * 1000
        self.frames.append(frame)
        self.actions.append(action)
        self.timestamps.append(time.time())
        return frame, latency

    def save_and_reset(self):
        save_session(self.frames, self.actions,
                     os.path.join(self.output_dir, f"session_{int(time.time())}"),
                     self.logger, timestamps=self.timestamps)
        self.frames, self.actions, self.timestamps = [], [], []
        if self.observation is not None:
            self.session.start(self.observation)  # fresh state + window


def interactive_loop(session: PlaySession, logger: Logger, output_dir: str,
                     actions_count: int, observation=None, input_helper=None):
    """Terminal interactive loop (reference play.py:138-201).

    Keys are read through utils.input_helper.InputHelper (reference
    utils/input_helper.py:4): single raw keypresses on a tty, line-buffered
    fallback on pipes/CI.
    """
    recorder = SessionRecorder(session, observation, logger, output_dir)
    if input_helper is None:
        input_helper = InputHelper(interactive=True)
    logger.print(f"Keys: 1..{actions_count} = action, 0 = save & reset, q = quit")
    while True:
        key = input_helper.read_character().strip()
        if key in ("q", ""):
            break
        if key == "0":
            recorder.save_and_reset()
            continue
        try:
            action = int(key) - 1
        except ValueError:
            continue
        if not 0 <= action < actions_count:
            continue
        frame, latency = recorder.step(action)
        logger.print(f"frame {len(recorder.frames)} action {action} "
                     f"({latency:.1f} ms)")


def window_loop(session: PlaySession, logger: Logger, output_dir: str,
                actions_count: int, observation=None, zoom: int = 10):
    """OpenCV window front end (reference play.py:96-198): upscaled frame
    display (starting with the initial observation), number-key actions
    (1..N), '0' saves the session and restarts it, 'q'/ESC or closing the
    window quits.  Requires a display; the terminal loop is the headless
    fallback."""
    import cv2

    window = "playable video generation"
    cv2.namedWindow(window, cv2.WINDOW_NORMAL)
    recorder = SessionRecorder(session, observation, logger, output_dir)

    def initial_frame():
        if observation is None:
            return None
        return frame_to_uint8(np.asarray(observation)[..., :3])

    frame = initial_frame()
    logger.print(f"Keys: 1..{actions_count} = action, 0 = save & reset, q = quit")
    while True:
        if frame is not None:
            display = cv2.resize(frame, (frame.shape[1] * zoom,
                                         frame.shape[0] * zoom),
                                 interpolation=cv2.INTER_NEAREST)
            label = f"action {recorder.actions[-1]}" if recorder.actions else ""
            cv2.putText(display, label, (8, 24), cv2.FONT_HERSHEY_SIMPLEX,
                        0.8, (0, 255, 255), 2)
            cv2.imshow(window, cv2.cvtColor(display, cv2.COLOR_RGB2BGR))
        raw = cv2.waitKey(0)
        if raw == -1 or cv2.getWindowProperty(
                window, cv2.WND_PROP_VISIBLE) < 1:
            break  # window closed by the window manager
        # Mask to 8 bits: GTK/Qt OpenCV builds set modifier bits (NumLock
        # etc.) in the waitKey return value.
        key = raw & 0xFF
        if key in (ord("q"), 27):
            break
        action = key - ord("0") - 1  # reference play.py:163-179 key map
        if action == -1:
            recorder.save_and_reset()
            frame = initial_frame()
            continue
        if not 0 <= action < actions_count:
            continue
        frame, _latency = recorder.step(action)
    cv2.destroyAllWindows()


def main():
    from playablevideogeneration_tpu.utils.jax_setup import setup_jax

    setup_jax()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--interactive", action="store_true")
    parser.add_argument("--window", action="store_true",
                        help="OpenCV window UI (needs a display)")
    parser.add_argument("--frames", type=int, default=60,
                        help="scripted rollout length")
    parser.add_argument("--noise", action="store_true",
                        help="sample N(0,1) action variations")
    parser.add_argument("--reference-checkpoint", type=str, default=None,
                        help="import weights from a reference .pth.tar "
                             "checkpoint instead of an orbax checkpoint")
    args = parser.parse_args()

    configuration = Configuration(args.config)
    configuration.check_config()
    configuration.create_directory_structure()
    config_dict = configuration.get_config()

    session, observation, logger = load_play_session(
        config_dict, noise=args.noise,
        reference_checkpoint=args.reference_checkpoint)
    output_dir = config_dict["logging"]["output_directory"]

    if args.window:
        window_loop(session, logger, output_dir,
                    config_dict["data"]["actions_count"],
                    observation=observation)
        return
    if args.interactive:
        interactive_loop(session, logger, output_dir,
                         config_dict["data"]["actions_count"],
                         observation=observation)
        return

    rng = np.random.default_rng(0)
    actions = rng.integers(0, config_dict["data"]["actions_count"],
                           size=args.frames)
    start = time.perf_counter()
    frames = session.rollout(actions)
    elapsed = time.perf_counter() - start
    logger.print(f"- Generated {len(frames)} frames in {elapsed:.2f}s "
                 f"({len(frames) / elapsed:.1f} fps)")
    save_session(list(frames), actions.tolist(),
                 os.path.join(output_dir, "scripted_session"), logger)


if __name__ == "__main__":
    main()
