"""Video writing: ffmpeg-pipe when available, PNG-sequence fallback.

Reference: utils/save_video_ffmpeg.py:11-210 pipes raw RGB frames to an
ffmpeg subprocess (x264), with action-label overlay and timecoded
variants.  ffmpeg is host-side I/O and stays a subprocess here; this
environment ships without ffmpeg, so absence degrades to PNG sequences.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw


class VideoSaver:
    def __init__(self, framerate: int = 10, crf: int = 23):
        self.framerate = framerate
        self.crf = crf
        self.ffmpeg = shutil.which("ffmpeg")

    @property
    def available(self) -> bool:
        return self.ffmpeg is not None

    def save_video(self, frames: np.ndarray, path: str):
        """Writes (N, H, W, 3) uint8 frames to mp4 via an ffmpeg raw-RGB
        pipe (reference save_video_ffmpeg.py:172-198), or to a PNG
        directory when ffmpeg is unavailable."""
        frames = np.asarray(frames, np.uint8)
        if not self.available:
            base = os.path.splitext(path)[0] + "_frames"
            os.makedirs(base, exist_ok=True)
            for i, frame in enumerate(frames):
                Image.fromarray(frame).save(os.path.join(base, f"{i:05d}.png"))
            return base
        n, h, w, _ = frames.shape
        cmd = [
            self.ffmpeg, "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
            "-s", f"{w}x{h}", "-r", str(self.framerate), "-i", "-",
            "-an", "-vcodec", "libx264", "-crf", str(self.crf),
            "-pix_fmt", "yuv420p", path,
        ]
        # stderr to a file, not a pipe: a pipe could deadlock if ffmpeg
        # fills it while this process is still writing frames to stdin.
        import tempfile

        with tempfile.TemporaryFile() as err:
            proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                    stdout=subprocess.DEVNULL, stderr=err)
            try:
                proc.stdin.write(frames.tobytes())
                proc.stdin.close()
            except BrokenPipeError:
                pass  # ffmpeg exited early; surface its stderr below
            if proc.wait() != 0:
                err.seek(0)
                tail = err.read().decode("utf-8", "replace").strip()
                raise RuntimeError(
                    f"ffmpeg failed (rc={proc.returncode}) writing {path}: "
                    + " | ".join(tail.splitlines()[-3:]))
        return path

    def save_video_with_actions(self, frames: np.ndarray,
                                actions: Sequence[int], path: str,
                                upscale: int = 1):
        """Overlays the selected action index on each frame before saving
        (reference save_video_ffmpeg.py:16-93)."""
        annotated: List[np.ndarray] = []
        for frame, action in zip(frames, actions):
            image = Image.fromarray(np.asarray(frame, np.uint8))
            if upscale > 1:
                image = image.resize((image.width * upscale,
                                      image.height * upscale), Image.NEAREST)
            draw = ImageDraw.Draw(image)
            draw.text((4, 4), f"action {action}", fill=(255, 255, 0))
            annotated.append(np.asarray(image))
        return self.save_video(np.stack(annotated), path)

    def save_video_timecoded(self, frames: np.ndarray,
                             timestamps: Sequence[float], path: str,
                             actions: Optional[Sequence[int]] = None,
                             upscale: int = 1):
        """Resamples frames to wall-clock presentation times so the video
        plays back at the speed it was generated — interactive sessions
        have irregular inter-frame intervals (reference
        save_video_ffmpeg.py:95-170).  Each source frame is repeated to
        cover [t_i, t_{i+1}) at the saver framerate; an optional action
        overlay is applied per source frame."""
        frames = np.asarray(frames, np.uint8)
        timestamps = np.asarray(timestamps, np.float64)
        if len(timestamps) != len(frames):
            raise ValueError("one timestamp per frame required")
        start = timestamps[0]
        # End time of the last frame: extend by the median interval.
        intervals = np.diff(timestamps)
        tail = float(np.median(intervals)) if len(intervals) else 1.0 / self.framerate
        ends = np.concatenate([timestamps[1:], [timestamps[-1] + tail]])

        timecoded: List[np.ndarray] = []
        for idx, frame in enumerate(frames):
            if actions is not None:
                image = Image.fromarray(frame)
                if upscale > 1:
                    image = image.resize((image.width * upscale,
                                          image.height * upscale), Image.NEAREST)
                draw = ImageDraw.Draw(image)
                draw.text((4, 4), f"action {actions[idx]}", fill=(255, 255, 0))
                frame = np.asarray(image)
            first_tick = int(round((timestamps[idx] - start) * self.framerate))
            last_tick = int(round((ends[idx] - start) * self.framerate))
            for _ in range(max(1, last_tick - first_tick)):
                timecoded.append(frame)
        return self.save_video(np.stack(timecoded), path)
