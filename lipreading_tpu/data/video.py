"""Host-side video decode (ref: cv2.VideoCapture loop — SURVEY.md §4.1).

Decode stays on the host (there is no TPU video codec — SURVEY.md §3); frames
go to the device as whole uint8 stacks, never per-frame. OpenCV is optional:
fixture .npz clips decode without it (the zero-egress build environment has
no ffmpeg binary; opencv-python bundles its own codecs when present).
"""

from __future__ import annotations

import numpy as np


def decode_video(path: str, max_frames: int | None = None) -> tuple[np.ndarray, float]:
    """Video file -> ([T, H, W, 3] uint8 RGB, fps). Requires OpenCV."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path!r}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    frames = []
    while max_frames is None or len(frames) < max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[..., ::-1])  # BGR -> RGB
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path!r}")
    return np.stack(frames).astype(np.uint8), float(fps)


def write_video(path: str, frames: np.ndarray, fps: float = 25.0) -> None:
    """[T, H, W, 3] uint8 RGB -> video file (fixture export). Requires OpenCV."""
    import cv2

    T, H, W, _ = frames.shape
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(path, fourcc, fps, (W, H))
    if not out.isOpened():
        raise IOError(f"cannot open video writer for {path!r}")
    for t in range(T):
        out.write(frames[t][..., ::-1])  # RGB -> BGR
    out.release()
