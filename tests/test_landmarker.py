"""Conv landmarker (ops/landmarker.py): geometry, distillation from the ERT,
and the cfg.preprocess.landmarker="conv" preprocessing path (SURVEY.md §7
plan-B; gate = landmark/ROI agreement with the ERT path, not bit parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_tpu.config import PreprocessConfig
from lipreading_tpu.fixtures import make_clip
from lipreading_tpu.ops import landmarker as lmk


def test_geometry_mean_shape_at_init():
    """Zero-ish output weights -> every prediction == bias (the mean shape),
    mapped through the box: origin + bias * size."""
    params = lmk.init_landmarker(0)
    params["out/w"] = np.zeros_like(params["out/w"])
    bias = np.linspace(0.1, 0.9, 136).astype(np.float32)
    params["out/b"] = bias
    pj = lmk.params_to_jax(params)
    gray = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (2, 160, 160)),
                       jnp.float32)
    boxes = jnp.asarray([[20.4, 30.6, 80.2], [0.0, 0.0, 160.0]], jnp.float32)
    out = np.asarray(lmk.predict_batch_conv(pj, gray, boxes))
    want0 = np.stack([20 + bias.reshape(68, 2)[:, 0] * 80,
                      31 + bias.reshape(68, 2)[:, 1] * 80], axis=1)
    np.testing.assert_allclose(out[0], want0, rtol=1e-5, atol=1e-4)


def test_round_face_boxes_clipping():
    boxes = jnp.asarray([[-5.0, 150.0, 40.0], [10.0, 10.0, 500.0]])
    ib = np.asarray(lmk.round_face_boxes(boxes, 160, 160))
    assert (ib[:, 0] >= 0).all() and (ib[:, 1] >= 0).all()
    assert (ib[:, 0] + ib[:, 2] <= 160).all()
    assert (ib[:, 1] + ib[:, 2] <= 160).all()


@pytest.mark.slow
def test_distillation_converges_and_preprocess_conv_path(assets):
    """A short distillation run gets within a few px of the ERT teacher and
    the conv preprocessing path produces ROIs close to the ERT path's."""
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_clips
    from lipreading_tpu.preproc_training import (
        conv_landmarker_error,
        train_conv_landmarker,
    )

    det_np, ert_np = assets
    clips = [make_clip(9100 + i) for i in range(6)]
    lm = train_conv_landmarker(det_np, ert_np, clips, steps=700, batch=32,
                               verbose=False)
    held = [make_clip(9300 + i) for i in range(2)]
    err = conv_landmarker_error(lm, det_np, ert_np, held)
    assert err < 3.0, f"distilled landmark error {err:.2f} px vs ERT"

    T = min(c.num_frames for c in held)
    stack = jnp.asarray(np.stack([c.frames[:T] for c in held]))
    det = params_to_jax(det_np)
    roi_e = np.asarray(preprocess_clips(det, model_to_jax(ert_np), stack))
    roi_c = np.asarray(preprocess_clips(
        det, lmk.params_to_jax(lm), stack, PreprocessConfig(landmarker="conv")
    ))
    assert roi_c.shape == roi_e.shape
    assert np.isfinite(roi_c).all()
    # mouth boxes from nearby landmarks -> mostly-overlapping crops; a small
    # mean pixel difference is the downstream distillation gate (exact bit
    # parity is the ERT path's contract, not this one's)
    assert np.abs(roi_c - roi_e).mean() < 0.5, np.abs(roi_c - roi_e).mean()


@pytest.mark.slow
def test_roi_pixel_distillation_and_box_agreement(assets):
    """roi_loss_weight distills through the differentiable subpixel ROI
    sampler (gradients flow box->landmarks->net) and conv_box_agreement
    reports a sane fraction."""
    from lipreading_tpu.preproc_training import (
        conv_box_agreement,
        conv_landmarker_error,
        train_conv_landmarker,
    )

    det_np, ert_np = assets
    clips = [make_clip(9100 + i) for i in range(4)]
    lm = train_conv_landmarker(det_np, ert_np, clips, steps=300, batch=32,
                               verbose=False, roi_loss_weight=1.0,
                               box_weight=0.0)
    held = [make_clip(9300)]
    err = conv_landmarker_error(lm, det_np, ert_np, held)
    assert np.isfinite(err) and err < 6.0, err
    agree = conv_box_agreement(lm, det_np, ert_np, held)
    assert 0.0 <= agree <= 1.0


def test_shipped_landmarker_asset_if_present():
    """Once assets/landmarker_conv.npz ships, pin its quality."""
    from lipreading_tpu.preproc_training import (
        conv_landmarker_error,
        load_assets,
        load_landmarker,
    )

    lm = load_landmarker()
    if lm is None:
        pytest.skip("conv landmarker asset not trained yet")
    det_np, ert_np = load_assets()
    held = [make_clip(9400 + i) for i in range(2)]
    err = conv_landmarker_error(lm, det_np, ert_np, held)
    assert err < 1.5, f"shipped conv landmarker drifted: {err:.2f} px vs ERT"


def test_shipped_robust_landmarker_asset_if_present():
    """Pin the robust-variant conv asset (ROI-loss distilled, round 3)
    against the robust ERT on styled clips."""
    from lipreading_tpu.preproc_training import (
        conv_landmarker_error,
        load_assets,
        load_landmarker,
    )

    lm = load_landmarker(variant="robust")
    if lm is None:
        pytest.skip("robust conv landmarker asset not trained yet")
    det_np, ert_np = load_assets(variant="robust")
    held = [make_clip(9400 + i, variation=0.6) for i in range(2)]
    err = conv_landmarker_error(lm, det_np, ert_np, held)
    assert err < 1.5, f"robust conv landmarker drifted: {err:.2f} px vs ERT"
