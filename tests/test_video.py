"""Host-side video encode/decode roundtrip (data/video.py — the cv2 path the
reference uses for real footage; fixtures bypass it)."""

import numpy as np
import pytest

from lipreading_tpu.data.video import decode_video, write_video


def test_video_roundtrip(tmp_path, clip0):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.mp4")
    frames = clip0.frames[:16]
    write_video(path, frames, fps=25.0)
    decoded, fps = decode_video(path)
    assert decoded.shape == frames.shape
    assert abs(fps - 25.0) < 0.5
    # lossy codec: content must survive within reasonable psnr
    err = np.abs(decoded.astype(np.float32) - frames.astype(np.float32))
    assert err.mean() < 8.0, err.mean()


def test_decode_missing_file_raises():
    pytest.importorskip("cv2")
    with pytest.raises(IOError):
        decode_video("/nonexistent/clip.mp4")
