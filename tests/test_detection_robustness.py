"""Detection failure handling: no-face frames, multi-face frames, tracking.

The reference loop faces dlib returning 0..N detections per frame and takes
dets[0] / skips no-detection frames (SURVEY.md §4.1). These tests pin the
batched equivalent: presence-scored top-k decode + temporal tracking
(ops/tracking.py, ops/detector.py, preprocess_clips_tracked)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.fixtures import (
    blank_out_frames,
    make_clip,
    paste_second_face,
    render_faceless_frames,
)
from lipreading_tpu.ops import detector as ddet
from lipreading_tpu.ops.roi import grayscale, resize_frames
from lipreading_tpu.ops.tracking import track_boxes
from lipreading_tpu.preproc_training import load_presence


@pytest.fixture(scope="module")
def presence():
    head = load_presence()
    if head is None:
        pytest.skip("presence head not trained (scripts/train_presence.py)")
    return {k: jnp.asarray(v) for k, v in head.items()}


@pytest.fixture(scope="module")
def det(assets):
    return ddet.params_to_jax(assets[0])


def _confidences(det, presence, frames):
    gray = grayscale(jnp.asarray(frames))
    feats, head = ddet.forward_features(det, resize_frames(gray, ddet.INPUT))
    pmap = ddet.presence_logits(presence, feats)
    return np.asarray(jax.nn.sigmoid(pmap).reshape(pmap.shape[0], -1).max(1))


def test_presence_separates_face_from_faceless(det, presence):
    clip = make_clip(60)
    pos = _confidences(det, presence, clip.frames[:8])
    neg_frames = np.concatenate([
        render_faceless_frames(3, 4),
        np.zeros((1, 160, 160, 3), np.uint8),
        np.full((1, 160, 160, 3), 255, np.uint8),
    ])
    neg = _confidences(det, presence, neg_frames)
    assert pos.min() > 0.7, pos
    assert neg.max() < 0.3, neg


def test_track_boxes_carries_through_gap():
    """A mid-clip no-face gap gets the carried box, flagged invalid."""
    B, T, K = 1, 6, 2
    box = np.asarray([10.0, 12.0, 40.0])
    drift = np.asarray([1.0, 0.0, 0.0])
    boxes = np.zeros((B, T, K, 3), np.float32)
    conf = np.full((B, T, K), 0.01, np.float32)
    for t in range(T):
        boxes[0, t, 0] = box + t * drift
        conf[0, t, 0] = 0.95
    conf[0, 2] = 0.01       # frames 2-3: no confident detection
    conf[0, 3] = 0.01
    boxes[0, 2, 0] = [140, 140, 10]   # garbage the threshold must reject
    tracked, valid = track_boxes(jnp.asarray(boxes), jnp.asarray(conf), 0.5)
    tracked, valid = np.asarray(tracked), np.asarray(valid)
    assert valid[0].tolist() == [True, True, False, False, True, True]
    np.testing.assert_allclose(tracked[0, 2], box + 1 * drift)  # carried
    np.testing.assert_allclose(tracked[0, 3], box + 1 * drift)
    np.testing.assert_allclose(tracked[0, 4], box + 4 * drift)  # reacquired


def test_track_boxes_backfills_leading_gap():
    B, T, K = 1, 4, 1
    boxes = np.tile(np.asarray([20.0, 20, 30], np.float32), (B, T, K, 1))
    conf = np.asarray([[[0.01], [0.01], [0.9], [0.9]]], np.float32)
    boxes[0, 2, 0] = [25, 25, 32]
    tracked, valid = track_boxes(jnp.asarray(boxes), jnp.asarray(conf), 0.5)
    tracked, valid = np.asarray(tracked), np.asarray(valid)
    assert valid[0].tolist() == [False, False, True, True]
    np.testing.assert_allclose(tracked[0, 0], [25, 25, 32])  # backfilled
    np.testing.assert_allclose(tracked[0, 1], [25, 25, 32])


def test_track_boxes_prefers_temporal_consistency():
    """Two confident candidates: the one near the previous box wins even if
    the other scores higher (multi-face disambiguation)."""
    B, T, K = 1, 3, 2
    boxes = np.zeros((B, T, K, 3), np.float32)
    conf = np.zeros((B, T, K), np.float32)
    boxes[0, 0] = [[10, 10, 40], [100, 100, 30]]
    conf[0, 0] = [0.9, 0.2]                  # t=0: pick top conf -> face A
    for t in (1, 2):
        boxes[0, t] = [[100, 100, 30], [11 + t, 10, 40]]  # A listed second
        conf[0, t] = [0.99, 0.8]             # intruder scores higher
    tracked, valid = track_boxes(jnp.asarray(boxes), jnp.asarray(conf), 0.5)
    tracked = np.asarray(tracked)
    assert valid.all()
    np.testing.assert_allclose(tracked[0, 1], [12, 10, 40])
    np.testing.assert_allclose(tracked[0, 2], [13, 10, 40])


def test_no_face_frames_flagged_not_garbage(det, presence, assets):
    """End to end: a clip with a cutaway gets valid=False + carried box on
    the blanked frames instead of silent garbage ROIs."""
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_clips_tracked

    clip = make_clip(61)
    gap = [4, 5, 6]
    frames = blank_out_frames(clip, gap, seed=2)[:12]
    ert = model_to_jax(assets[1])
    rois, valid, aux = preprocess_clips_tracked(
        det, presence, ert, jnp.asarray(frames[None]), return_aux=True
    )
    valid = np.asarray(valid)[0]
    for t in range(12):
        assert valid[t] == (t not in gap), (t, valid)
    # carried box on the gap == last confident box
    fb = np.asarray(aux["face_boxes"])[0]
    np.testing.assert_allclose(fb[4], fb[3])
    np.testing.assert_allclose(fb[5], fb[3])
    # and the whole thing is finite
    assert np.isfinite(np.asarray(rois)).all()


def test_second_face_does_not_hijack_track(det, presence, assets):
    """A second face composited into the corner must not steal the track:
    tracked boxes stay on the ground-truth face."""
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_clips_tracked

    clip = make_clip(62)
    frames = paste_second_face(clip, donor_seed=901)[:12]
    ert = model_to_jax(assets[1])
    _, valid, aux = preprocess_clips_tracked(
        det, presence, ert, jnp.asarray(frames[None]), return_aux=True
    )
    fb = np.asarray(aux["face_boxes"])[0]
    for t in range(12):
        x0, y0, w, h = clip.boxes[t]
        gt_c = np.asarray([x0 + w / 2, y0 + h / 2])
        got_c = np.asarray([fb[t, 0] + fb[t, 2] / 2, fb[t, 1] + fb[t, 2] / 2])
        assert np.linalg.norm(got_c - gt_c) < max(w, h) * 0.5, (t, got_c, gt_c)


def test_tracked_matches_untracked_on_clean_clip(det, presence, assets):
    """On an all-faces clip the tracked path must agree with the default
    pipeline (boxes may differ only within detector noise -> same ROIs to a
    loose tolerance; the default path's bit-parity is pinned elsewhere)."""
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import (
        preprocess_clips,
        preprocess_clips_tracked,
    )

    clip = make_clip(63)
    frames = clip.frames[:10][None]
    ert = model_to_jax(assets[1])
    base = np.asarray(preprocess_clips(det, ert, jnp.asarray(frames)))
    rois, valid = preprocess_clips_tracked(
        det, presence, ert, jnp.asarray(frames)
    )
    assert np.asarray(valid).all()
    # same argmax cell selected -> identical boxes -> identical ROIs
    np.testing.assert_allclose(np.asarray(rois), base, atol=1e-5)


def test_demo_default_flags_cutaway_mp4(tmp_path, assets, presence):
    """VERDICT r2 missing #2: an arbitrary mp4 with a cutaway, fed through
    the DEFAULT demo CLI (no tracked= flag), must produce a flagged gap —
    not silently transcribe garbage ROIs."""
    import os
    import subprocess
    import sys

    from lipreading_tpu.data.video import write_video
    from lipreading_tpu.fixtures import blank_out_frames, make_clip

    clip = make_clip(21)
    frames = blank_out_frames(clip, [4, 5, 6], seed=3)[:12]
    path = str(tmp_path / "cutaway.mp4")
    write_video(path, frames, fps=25.0)

    root = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, os.path.join("scripts", "demo.py"),
         "workdir=/nonexistent", "release=nonexistent", f"video={path}",
         "model.frontend_channels=4,8,12", "model.frontend_dim=32",
         "model.gru_hidden=32", "model.gru_layers=1", "model.dtype=float32",
         "beam=1"],
        env=env, cwd=root, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "flagged no-face" in r.stdout, r.stdout
    assert "transcript:" in r.stdout, r.stdout


def test_generate_dataview_video_default_tracked(tmp_path, assets, presence):
    """generate_dataview video=... defaults to tracked preprocessing and
    stores per-frame valid masks (skip-frame semantics at read time)."""
    import os
    import subprocess
    import sys

    from lipreading_tpu.data.dataview import Dataview
    from lipreading_tpu.data.video import write_video
    from lipreading_tpu.fixtures import blank_out_frames, make_clip

    clip = make_clip(22)
    frames = blank_out_frames(clip, [3, 4], seed=5)[:10]
    vid = str(tmp_path / "clip.mp4")
    write_video(vid, frames, fps=25.0)
    vtt = str(tmp_path / "clip.vtt")
    with open(vtt, "w") as f:
        f.write("WEBVTT\n\n00:00:00.000 --> 00:00:00.400\nhello world\n")
    out = str(tmp_path / "dv")

    root = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, os.path.join("scripts", "generate_dataview.py"),
         f"out={out}", f"video={vid}", f"vtt={vtt}"],
        env=env, cwd=root, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "flagged no-face" in r.stdout, r.stdout
    view = Dataview(out)
    assert len(view) >= 1
    v = view.frame_valid(0)
    assert v.dtype == bool and not v.all()     # the cutaway is masked
