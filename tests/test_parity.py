"""BASELINE config 2: batched device preprocessing vs the CPU oracle.

Every stage of the fused TPU path is diffed element-wise against the per-frame
oracle loop (SURVEY.md §5 item 2: "the CPU reference path is kept alive inside
the new repo purely as a test oracle"). Runs on the CPU backend in CI; the
same code paths run on TPU (bench.py re-checks parity there).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lipreading_tpu.fixtures import make_clip
from lipreading_tpu.oracle import detector as odet
from lipreading_tpu.oracle import ert as oert
from lipreading_tpu.oracle.pipeline import run_clip
from lipreading_tpu.oracle.roi import (
    grayscale as ogray,
    mouth_box_from_landmarks,
    resize_frame,
    round_box,
    sample_roi,
)
from lipreading_tpu.ops import detector as ddet
from lipreading_tpu.ops import ert as dert
from lipreading_tpu.ops import roi as droi
from lipreading_tpu.ops.preprocess import (
    mouth_boxes_from_landmarks,
    preprocess_frames,
)


@pytest.fixture(scope="module")
def frames():
    return make_clip(11).frames[:6]


@pytest.fixture(scope="module")
def gray_np(frames):
    return np.stack([ogray(f) for f in frames])


def test_grayscale_parity(frames, gray_np):
    got = np.asarray(droi.grayscale(jnp.asarray(frames)))
    np.testing.assert_allclose(got, gray_np, atol=1e-4)


def test_resize_parity(gray_np):
    want = np.stack([resize_frame(g, 64) for g in gray_np])
    got = np.asarray(droi.resize_frames(jnp.asarray(gray_np), 64))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_detector_parity(gray_np):
    params = odet.init_detector(0)
    g64 = np.stack([resize_frame(g, 64) for g in gray_np])
    want = np.stack([odet.forward(params, g) for g in g64])
    got = np.asarray(ddet.forward(ddet.params_to_jax(params), jnp.asarray(g64)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_detect_box_parity_trained(assets, gray_np):
    det, _ = assets
    want = np.stack([odet.detect(det, g) for g in gray_np])
    got = np.asarray(ddet.detect(ddet.params_to_jax(det), jnp.asarray(gray_np)))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_ert_parity_random_weights(gray_np):
    """Device ERT must pick identical leaves for arbitrary (random) weights."""
    model = oert.random_ert(0)
    boxes = np.tile(np.asarray([[20.0, 20.0, 120.0]], np.float32), (len(gray_np), 1))
    want = np.stack(
        [oert.predict(model, g, tuple(b)) for g, b in zip(gray_np, boxes)]
    )
    got = np.asarray(
        dert.predict_batch(dert.model_to_jax(model), jnp.asarray(gray_np),
                           jnp.asarray(boxes))
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_ert_gather_modes_bit_identical(gray_np):
    """The MXU one-hot contraction ("matmul", the TPU default since round
    4 — the roofline showed take_along_axis bounded the whole cascade at
    its 78M elem/s gather floor) must be BIT-identical to the take path:
    every inner sum has exactly one nonzero term and multiplies are exact
    fp32 under precision=HIGHEST, so no tolerance is needed.

    LIMITATION (ADVICE r4): on the CPU mesh precision=HIGHEST is plain
    fp32, so this equality is the easy case. The claim that matters —
    bit-identity under the TPU's bf16-decomposed HIGHEST, where 'matmul'
    is actually selected — is exercised on the real chip by
    scripts/tpu_checks.py (gather_bit_identity check)."""
    model = oert.random_ert(1)
    boxes = np.tile(np.asarray([[18.0, 22.0, 118.0]], np.float32), (len(gray_np), 1))
    mj = dert.model_to_jax(model)
    a = np.asarray(dert.predict_batch(mj, jnp.asarray(gray_np),
                                      jnp.asarray(boxes), gather="take"))
    b = np.asarray(dert.predict_batch(mj, jnp.asarray(gray_np),
                                      jnp.asarray(boxes), gather="matmul"))
    np.testing.assert_array_equal(a, b)


def test_ert_parity_trained(assets, gray_np):
    det, ert = assets
    boxes = np.stack([odet.detect(det, g) for g in gray_np]).astype(np.float32)
    want = np.stack(
        [oert.predict(ert, g, tuple(b)) for g, b in zip(gray_np, boxes)]
    )
    got = np.asarray(
        dert.predict_batch(dert.model_to_jax(ert), jnp.asarray(gray_np),
                           jnp.asarray(boxes))
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_mouth_box_parity(gray_np):
    rng = np.random.default_rng(0)
    lms = rng.uniform(10, 150, size=(4, 68, 2)).astype(np.float32)
    want = np.stack([round_box(mouth_box_from_landmarks(l), 160, 160) for l in lms])
    got = np.asarray(mouth_boxes_from_landmarks(jnp.asarray(lms), 0.30, 160, 160))
    np.testing.assert_array_equal(got, want)


def _roi_oracle(gray_np, boxes):
    out = np.stack(
        [sample_roi(g, (b[0], b[1], b[2], b[2]), 96) for g, b in zip(gray_np, boxes)]
    )
    return ((out / 255.0) - np.float32(0.421)) / np.float32(0.165)


@pytest.fixture(scope="module")
def mouth_boxes(gray_np):
    rng = np.random.default_rng(7)
    boxes = np.stack(
        [
            rng.integers(0, 60, len(gray_np)),
            rng.integers(0, 60, len(gray_np)),
            rng.integers(20, 90, len(gray_np)),
        ],
        axis=1,
    ).astype(np.int32)
    return boxes


def test_roi_xla_parity(gray_np, mouth_boxes):
    want = _roi_oracle(gray_np, mouth_boxes)
    got = np.asarray(droi.sample_rois_xla(jnp.asarray(gray_np), jnp.asarray(mouth_boxes)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_roi_pallas_parity(gray_np, mouth_boxes):
    want = _roi_oracle(gray_np, mouth_boxes)
    got = np.asarray(
        droi.sample_rois_pallas(jnp.asarray(gray_np), jnp.asarray(mouth_boxes))
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.fixture(scope="module")
def float_boxes(gray_np):
    rng = np.random.default_rng(11)
    return np.stack(
        [
            rng.uniform(-3.0, 60.0, len(gray_np)),   # origins may poke out
            rng.uniform(-3.0, 60.0, len(gray_np)),   # of frame: clamped per
            rng.uniform(20.0, 110.0, len(gray_np)),  # sample, not shifted
        ],
        axis=1,
    ).astype(np.float32)


def _roi_oracle_subpixel(gray_np, boxes):
    from lipreading_tpu.oracle.roi import sample_roi_subpixel

    out = np.stack(
        [sample_roi_subpixel(g, tuple(b), 96) for g, b in zip(gray_np, boxes)]
    )
    return ((out / 255.0) - np.float32(0.421)) / np.float32(0.165)


def test_roi_xla_subpixel_parity(gray_np, float_boxes):
    want = _roi_oracle_subpixel(gray_np, float_boxes)
    got = np.asarray(droi.sample_rois_xla(
        jnp.asarray(gray_np), jnp.asarray(float_boxes), subpixel=True))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_roi_pallas_subpixel_parity(gray_np, float_boxes):
    want = _roi_oracle_subpixel(gray_np, float_boxes)
    got = np.asarray(droi.sample_rois_pallas(
        jnp.asarray(gray_np), jnp.asarray(float_boxes), subpixel=True))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_roi_subpixel_integer_boxes_match_rounded_path():
    """On boxes that happen to be integral the subpixel sampler reproduces
    the rounded path exactly away from frame edges (same taps, same
    weights) — pinning that the two formulations share their arithmetic."""
    rng = np.random.default_rng(3)
    gray = rng.uniform(0, 255, (4, 160, 160)).astype(np.float32)
    ib = np.stack([rng.integers(5, 50, 4), rng.integers(5, 50, 4),
                   rng.integers(20, 80, 4)], axis=1).astype(np.int32)
    a = np.asarray(droi.sample_rois_xla(jnp.asarray(gray), jnp.asarray(ib)))
    b = np.asarray(droi.sample_rois_xla(
        jnp.asarray(gray), jnp.asarray(ib.astype(np.float32)),
        subpixel=True))
    # fp32 frac differs in the last bits (subpixel computes floor/frac on
    # src+start; the rounded path on src alone) — taps identical, weights
    # equal to fp32 rounding
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_roi_pallas_large_batch():
    """N=2048+ frames through the Pallas ROI kernel in one call.

    Regression: boxes used to ride SMEM as [N, 3] — SMEM pads the minor axis
    per row (512 B granularity), so N=2048 burned the whole 1 MiB SMEM budget
    and the TPU compile failed. The [3, N] transpose keeps SMEM at 3 padded
    rows for any N (interpret mode checks the index plumbing; the SMEM bound
    itself only manifests compiling on real TPU, covered by bench runs)."""
    rng = np.random.default_rng(7)
    N = 2048
    gray = rng.uniform(0, 255, (N, 40, 40)).astype(np.float32)
    boxes = np.stack(
        [rng.integers(0, 10, N), rng.integers(0, 10, N),
         rng.integers(16, 30, N)], axis=1,
    ).astype(np.int32)
    got = np.asarray(
        droi.sample_rois_pallas(jnp.asarray(gray), jnp.asarray(boxes),
                                out_size=24)
    )
    want = np.asarray(
        droi.sample_rois_xla(jnp.asarray(gray), jnp.asarray(boxes),
                             out_size=24)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_full_pipeline_parity(assets, clip0):
    """End-to-end: batched device preprocess == per-frame oracle loop."""
    det, ert = assets
    frames = clip0.frames[:12]
    want = run_clip(frames, det, ert)
    rois, aux = preprocess_frames(
        ddet.params_to_jax(det), dert.model_to_jax(ert),
        jnp.asarray(frames), return_aux=True,
    )
    np.testing.assert_allclose(
        np.asarray(aux["face_boxes"]), want.face_boxes, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(aux["landmarks"]), want.landmarks, atol=1e-2
    )
    np.testing.assert_array_equal(np.asarray(aux["mouth_boxes"]), want.mouth_boxes)
    np.testing.assert_allclose(np.asarray(rois), want.roi, atol=1e-3)
