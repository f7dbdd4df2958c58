import numpy as np
import pytest

from lipreading_tpu.oracle import ert as oert
from lipreading_tpu.oracle.pipeline import run_clip
from lipreading_tpu.oracle.roi import (
    grayscale,
    mouth_box_from_landmarks,
    round_box,
    sample_roi,
)


def test_sample_roi_matches_cv2_crop_resize():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (160, 160)).astype(np.float32)
    for x0, y0, s in [(32, 40, 64), (0, 0, 37), (100, 90, 60), (5, 121, 39)]:
        crop = img[y0:y0 + s, x0:x0 + s]
        want = cv2.resize(crop, (96, 96), interpolation=cv2.INTER_LINEAR)
        got = sample_roi(img, (x0, y0, s, s), 96)
        # cv2 uses fixed-point bilinear; float path agrees to ~2e-3
        assert np.abs(got - want).max() < 5e-3


def test_grayscale_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    want = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2GRAY)
    assert np.abs(grayscale(rgb) - want).max() < 1e-3


def test_round_box_clamping():
    assert round_box((10.4, 20.6, 30.2), 160, 160) == (10, 21, 30)
    # box hanging off the frame gets shifted inside
    x0, y0, s = round_box((150.0, -5.0, 40.0), 160, 160)
    assert x0 + s <= 160 and y0 >= 0
    # oversized box is clamped to the frame
    assert round_box((0, 0, 999), 160, 160)[2] == 160


def test_mouth_box_square_and_centered():
    lm = np.zeros((68, 2), dtype=np.float32)
    lm[48:68, 0] = np.linspace(40, 80, 20)
    lm[48:68, 1] = np.linspace(100, 112, 20)
    x0, y0, s = mouth_box_from_landmarks(lm, margin=0.5)
    assert s == pytest.approx(40 * 1.5)
    assert x0 + s / 2 == pytest.approx(60)
    assert y0 + s / 2 == pytest.approx(106)


def test_ert_save_load_roundtrip(tmp_path):
    m = oert.random_ert(3, stages=2, pool=16, trees=4, depth=3)
    p = tmp_path / "ert.npz"
    m.save(p)
    m2 = oert.ERTModel.load(p)
    for f in ("mean_shape", "anchors", "offsets", "feat1", "feat2", "thresh", "leaves"):
        assert (getattr(m, f) == getattr(m2, f)).all()


def test_golden_dump_regression(assets, clip0, golden):
    """BASELINE config 1: oracle rerun must reproduce the checked dump exactly."""
    det, ert = assets
    res = run_clip(clip0.frames, det, ert)
    np.testing.assert_array_equal(res.roi, golden["roi"])
    np.testing.assert_array_equal(res.landmarks, golden["landmarks"])
    np.testing.assert_array_equal(res.face_boxes, golden["face_boxes"])
    np.testing.assert_array_equal(res.mouth_boxes, golden["mouth_boxes"])


def test_trained_landmarker_quality(assets, clip0):
    det, ert = assets
    res = run_clip(clip0.frames, det, ert)
    err = np.abs(res.landmarks - clip0.landmarks).mean()
    assert err < 1.0, f"trained landmark error {err} px too high"
    # predicted ROI must closely match the ROI from ground-truth landmarks
    gt = run_clip(clip0.frames, det, ert, landmarks_override=clip0.landmarks)
    assert np.abs(res.roi - gt.roi).mean() < 0.1
