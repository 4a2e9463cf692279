"""MP4 writing (reference main.py:44-63 pipes raw RGB into an ffmpeg
subprocess). We use the ffmpeg binary when present and fall back to
cv2.VideoWriter (this image ships OpenCV but no ffmpeg binary)."""

from __future__ import annotations

import shutil
import subprocess

import numpy as np


class VideoSink:
    """Incremental MP4 writer: append frames chunk-by-chunk instead of
    materializing the whole (N, H, W, 3) array (a full-length eval
    video is multiple GB). Lazily opens on the first frame (needs the
    dimensions); ffmpeg pipe when the binary exists, cv2 otherwise."""

    def __init__(self, fn: str, framerate: int = 32):
        self.fn = fn
        self.framerate = framerate
        self._proc = None
        self._cv2 = None
        self._hw = None

    def _open(self, h: int, w: int) -> None:
        self._hw = (h - h % 2, w - w % 2)  # yuv420p needs even dims
        if shutil.which("ffmpeg"):
            hh, ww = self._hw
            cmd = ["ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt",
                   "rgb24", "-s", f"{ww}x{hh}", "-r",
                   str(self.framerate), "-i", "pipe:", "-pix_fmt",
                   "yuv420p", "-vcodec", "libx264", "-r",
                   str(self.framerate), self.fn]
            self._proc = subprocess.Popen(
                cmd, stdin=subprocess.PIPE,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        else:
            import cv2
            self._cv2 = cv2.VideoWriter(
                self.fn, cv2.VideoWriter_fourcc(*"mp4v"),
                self.framerate, (self._hw[1], self._hw[0]))

    def append(self, frame: np.ndarray) -> None:
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            frame = np.clip(frame, 0, 255).astype(np.uint8)
        if self._hw is None:
            self._open(*frame.shape[:2])
        frame = frame[: self._hw[0], : self._hw[1]]
        if self._proc is not None:
            self._proc.stdin.write(frame.tobytes())
        else:
            import cv2
            self._cv2.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    def close(self) -> None:
        if self._proc is not None:
            self._proc.stdin.close()
            self._proc.wait()
            self._proc = None
        if self._cv2 is not None:
            self._cv2.release()
            self._cv2 = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def vidwrite(fn: str, images, framerate: int = 32) -> None:
    """Write (N, H, W, 3) RGB frames to an H.264/mp4v MP4 file."""
    images = np.asarray(images)
    if images.dtype != np.uint8:
        images = np.clip(images, 0, 255).astype(np.uint8)
    with VideoSink(fn, framerate=framerate) as sink:
        for frame in images:
            sink.append(frame)
