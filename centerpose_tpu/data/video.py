"""Video frame sources for the demo/eval pipelines.

Parity target: the reference decodes videos with an ffmpeg rawvideo pipe
(data/preprocess.py:32-81) and cv2.VideoCapture in demo.py. This module provides:
  * `FrameDirReader` — a directory of ordered image frames (always available);
  * `FFmpegReader` — mp4/webm via an ffmpeg subprocess pipe, gated on the binary
    being present (this image ships without ffmpeg; the reader raises a clear
    error instead of importing a stub codec).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np


class FrameDirReader:
    def __init__(self, path: str):
        exts = ("*.png", "*.jpg", "*.jpeg")
        self.files = sorted(
            sum([glob.glob(os.path.join(path, e)) for e in exts], [])
        )
        if not self.files:
            raise FileNotFoundError(f"no image frames under {path}")

    def __iter__(self) -> Iterator[np.ndarray]:
        from PIL import Image

        for f in self.files:
            yield np.asarray(Image.open(f).convert("RGB"))

    def __len__(self):
        return len(self.files)


class FFmpegReader:
    """Stream RGB24 frames from a video file through ffmpeg."""

    def __init__(self, path: str, fps: Optional[float] = None):
        if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
            raise RuntimeError(
                "ffmpeg/ffprobe not available in this environment; use a frame "
                "directory (FrameDirReader) instead"
            )
        self.path = path
        self.fps = fps
        self.size = self._probe_size()

    def _probe_size(self) -> Tuple[int, int]:
        out = subprocess.check_output(
            [
                "ffprobe", "-v", "error", "-select_streams", "v:0",
                "-show_entries", "stream=width,height", "-of", "csv=p=0",
                self.path,
            ]
        )
        w, h = (int(v) for v in out.decode().strip().split(","))
        return w, h

    def __iter__(self) -> Iterator[np.ndarray]:
        w, h = self.size
        cmd = ["ffmpeg", "-v", "error", "-i", self.path]
        if self.fps:
            cmd += ["-vf", f"fps={self.fps}"]
        cmd += ["-f", "rawvideo", "-pix_fmt", "rgb24", "-"]
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        frame_bytes = w * h * 3
        try:
            while True:
                buf = proc.stdout.read(frame_bytes)
                if len(buf) < frame_bytes:
                    return
                yield np.frombuffer(buf, np.uint8).reshape(h, w, 3)
        finally:
            proc.stdout.close()
            proc.wait()


def open_video(path: str, fps: Optional[float] = None):
    if os.path.isdir(path):
        return FrameDirReader(path)
    return FFmpegReader(path, fps)
