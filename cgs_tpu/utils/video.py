"""MP4 writing (reference main.py:44-63 pipes raw RGB into an ffmpeg
subprocess). We use the ffmpeg binary when present and fall back to
cv2.VideoWriter (this image ships OpenCV but no ffmpeg binary)."""

from __future__ import annotations

import shutil
import subprocess

import numpy as np


def _ffmpeg_write(fn: str, images: np.ndarray, framerate: int) -> None:
    n, h, w, _ = images.shape
    cmd = ["ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
           "-s", f"{w}x{h}", "-r", str(framerate), "-i", "pipe:",
           "-pix_fmt", "yuv420p", "-vcodec", "libx264",
           "-r", str(framerate), fn]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    for frame in images:
        proc.stdin.write(frame.astype(np.uint8).tobytes())
    proc.stdin.close()
    proc.wait()


def _cv2_write(fn: str, images: np.ndarray, framerate: int) -> None:
    import cv2
    n, h, w, _ = images.shape
    out = cv2.VideoWriter(fn, cv2.VideoWriter_fourcc(*"mp4v"),
                          framerate, (w, h))
    try:
        for frame in images:
            out.write(cv2.cvtColor(frame.astype(np.uint8),
                                   cv2.COLOR_RGB2BGR))
    finally:
        out.release()


def vidwrite(fn: str, images, framerate: int = 32) -> None:
    """Write (N, H, W, 3) RGB frames to an H.264/mp4v MP4 file."""
    images = np.asarray(images)
    if images.dtype != np.uint8:
        images = np.clip(images, 0, 255).astype(np.uint8)
    # even dimensions required by yuv420p
    h, w = images.shape[1:3]
    images = images[:, : h - h % 2, : w - w % 2]
    if shutil.which("ffmpeg"):
        _ffmpeg_write(fn, images, framerate)
    else:
        _cv2_write(fn, images, framerate)
