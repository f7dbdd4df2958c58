"""Native C++ host library vs the numpy oracle (bit-level contracts)."""

import numpy as np
import pytest

from lipreading_tpu import native
from lipreading_tpu.fixtures import make_clip
from lipreading_tpu.oracle import ert as oert
from lipreading_tpu.oracle.roi import grayscale as ogray, sample_roi

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not buildable (no g++?)"
)


@pytest.fixture(scope="module")
def clip():
    return make_clip(21)


def test_native_grayscale(clip):
    want = ogray(clip.frames[0])
    got = native.grayscale(clip.frames[0])
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_native_roi(clip):
    g = ogray(clip.frames[0])
    for box in [(30, 40, 64), (0, 0, 37), (90, 100, 60)]:
        want = ((sample_roi(g, (box[0], box[1], box[2], box[2]), 96) / 255.0
                 - np.float32(0.421)) / np.float32(0.165))
        got = native.sample_roi(g, box)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_native_ert(clip):
    model = oert.random_ert(1)
    g = ogray(clip.frames[0])
    box = (20.0, 25.0, 110.0)
    want = oert.predict(model, g, box)
    got = native.ert_predict(model, g, box)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_native_roi_adversarial_sizes_fuzz(clip):
    """out_size beyond the old 256-entry stack buffers and odd/extreme crop
    boxes must stay exact vs the oracle (the old fixed int[256] tables were
    silent stack corruption past 256 — VERDICT r1 weak #6)."""
    g = ogray(clip.frames[0])
    H, W = g.shape
    rng = np.random.default_rng(99)
    cases = [(0, 0, 2, 1), (5, 7, 3, 257), (10, 12, 97, 300),
             (0, 0, min(H, W), 512), (33, 21, 101, 384)]
    for _ in range(10):
        s = int(rng.integers(2, min(H, W)))
        x0 = int(rng.integers(0, W - s + 1))
        y0 = int(rng.integers(0, H - s + 1))
        out = int(rng.integers(2, 420))
        cases.append((x0, y0, s, out))
    for x0, y0, s, out in cases:
        want = ((sample_roi(g, (x0, y0, s, s), out) / 255.0
                 - np.float32(0.421)) / np.float32(0.165))
        got = native.sample_roi(g, (x0, y0, s), out_size=out)
        np.testing.assert_allclose(got, want, atol=1e-4,
                                   err_msg=str((x0, y0, s, out)))


def test_native_ert_large_pool(clip):
    """Pool sizes past the old 512 cap work (heap-allocated vals)."""
    model = oert.random_ert(2, pool=700)
    g = ogray(clip.frames[0])
    box = (20.0, 25.0, 110.0)
    want = oert.predict(model, g, box)
    got = native.ert_predict(model, g, box)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_native_full_clip(assets, clip):
    """Whole-clip native preprocessing vs the python oracle pipeline."""
    from lipreading_tpu.oracle.pipeline import run_clip

    det, ert = assets
    frames = clip.frames[:10]
    want = run_clip(frames, det, ert)
    rois, lms = native.preprocess_clip(
        ert, frames, want.face_boxes, return_landmarks=True
    )
    np.testing.assert_allclose(lms, want.landmarks, atol=1e-2)
    np.testing.assert_allclose(rois, want.roi, atol=1e-3)
