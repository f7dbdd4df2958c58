"""Full batched video->ROI preprocessing on device (BASELINE configs 2 & 5).

Replaces the reference's per-frame CPU hot loop (SURVEY.md §4.1) with ONE jit
program over a whole frame stack:

    frames [N, H, W, 3] u8 -> gray -> detect -> 68 landmarks -> mouth box
                           -> fused crop/resize/normalize -> roi [N, 96, 96]

Every stage is batched; the only host work left is video decode (SURVEY.md §8:
ffmpeg/OpenCV stays host-side — there is no TPU video codec). This function is
what the input pipeline fuses into training (BASELINE.json:5 "preprocessing
kernels fused into the input pipeline so the TPU never stalls").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lipreading_tpu.config import PreprocessConfig
from lipreading_tpu.ops import detector as det_ops
from lipreading_tpu.ops import ert as ert_ops
from lipreading_tpu.ops import roi as roi_ops


def mouth_boxes_from_landmarks(
    landmarks: jnp.ndarray, margin: float, frame_h: int, frame_w: int
) -> jnp.ndarray:
    """[B, 68, 2] -> [B, 3] int32 square mouth boxes.

    Same geometry + rounding as oracle mouth_box_from_landmarks + round_box.
    """
    pts = landmarks[:, 48:68, :].astype(jnp.float32)
    mn = pts.min(axis=1)
    mx = pts.max(axis=1)
    c = (mn + mx) / 2.0
    size = jnp.max(mx - mn, axis=1) * (1.0 + margin)
    x0 = c[:, 0] - size / 2.0
    y0 = c[:, 1] - size / 2.0
    s = jnp.floor(size + 0.5).astype(jnp.int32)
    s = jnp.clip(s, 2, min(frame_h, frame_w))
    xi = jnp.clip(jnp.floor(x0 + 0.5).astype(jnp.int32), 0, frame_w - s)
    yi = jnp.clip(jnp.floor(y0 + 0.5).astype(jnp.int32), 0, frame_h - s)
    return jnp.stack([xi, yi, s], axis=1)


def mouth_boxes_float(landmarks: jnp.ndarray, margin: float) -> jnp.ndarray:
    """[B, 68, 2] -> [B, 3] float32 square mouth boxes — NO rounding.

    The subpixel-sampling analogue of mouth_boxes_from_landmarks (oracle
    mouth_box_from_landmarks float geometry); frame clamping happens
    per-sample inside the ROI kernel instead of by shifting the box."""
    pts = landmarks[:, 48:68, :].astype(jnp.float32)
    mn = pts.min(axis=1)
    mx = pts.max(axis=1)
    c = (mn + mx) / 2.0
    size = jnp.max(mx - mn, axis=1) * (1.0 + margin)
    return jnp.stack(
        [c[:, 0] - size / 2.0, c[:, 1] - size / 2.0, size], axis=1)


def use_subpixel_roi(cfg: PreprocessConfig) -> bool:
    """Resolve cfg.roi_sampling ("auto" = subpixel iff landmarker != ert)."""
    if cfg.roi_sampling == "auto":
        return cfg.landmarker != "ert"
    return cfg.roi_sampling == "subpixel"


def preprocess_frames(
    det_params,
    ert_model,
    frames: jnp.ndarray,
    cfg: PreprocessConfig | None = None,
    return_aux: bool = False,
):
    """[N, H, W, 3] uint8 RGB -> [N, R, R] normalized float32 ROIs.

    ``det_params``/``ert_model`` are jnp pytrees (ops.detector.params_to_jax /
    ops.ert.model_to_jax). Jit-compatible; N/H/W static per compilation.
    """
    cfg = cfg or PreprocessConfig()
    N, H, W, _ = frames.shape
    gray = roi_ops.grayscale(frames)                          # [N, H, W]
    face_boxes = det_ops.detect(det_params, gray)             # [N, 3] float
    if cfg.landmarker == "conv":
        from lipreading_tpu.ops.landmarker import predict_batch_conv

        landmarks = predict_batch_conv(ert_model, gray, face_boxes)
    else:
        landmarks = ert_ops.predict_batch(ert_model, gray, face_boxes)
    subpix = use_subpixel_roi(cfg)
    mboxes = (mouth_boxes_float(landmarks, cfg.roi_margin) if subpix else
              mouth_boxes_from_landmarks(landmarks, cfg.roi_margin, H, W))
    rois = roi_ops.sample_rois(
        gray, mboxes, cfg.roi_size,
        mean=cfg.normalize_mean, std=cfg.normalize_std, subpixel=subpix,
    )
    if return_aux:
        return rois, {
            "face_boxes": face_boxes,
            "landmarks": landmarks,
            "mouth_boxes": mboxes,
        }
    return rois


def make_preprocessor(det_params, ert_model, cfg: PreprocessConfig | None = None):
    """Returns a jitted ``frames[N,H,W,3]u8 -> roi[N,R,R]f32`` closure."""
    cfg = cfg or PreprocessConfig()

    @jax.jit
    def run(frames):
        return preprocess_frames(det_params, ert_model, frames, cfg)

    return run


def preprocess_padded(
    det_params,
    ert_model,
    frames,
    cfg: PreprocessConfig | None = None,
    bucket: int = 64,
):
    """Preprocess [N, H, W, 3] with N padded up to a multiple of ``bucket``.

    Variable-length clips would otherwise force one XLA compilation per
    distinct N (minutes of compile time over a corpus); padding by repeating
    the last frame bounds the compile cache to N/bucket shapes and the
    padded rows are sliced off. Returns numpy [N, R, R].
    """
    import numpy as np

    cfg = cfg or PreprocessConfig()
    frames = np.asarray(frames)
    n = frames.shape[0]
    padded = -(-n // bucket) * bucket
    if padded != n:
        frames = np.concatenate(
            [frames, np.repeat(frames[-1:], padded - n, axis=0)]
        )
    out = _padded_jit(det_params, ert_model, jnp.asarray(frames), cfg)
    return np.asarray(out[:n])


_PADDED_CACHE: dict = {}


def _padded_jit(det, ert, frames, cfg: PreprocessConfig):
    key = (frames.shape, cfg.roi_size, cfg.roi_margin,
           cfg.normalize_mean, cfg.normalize_std, cfg.landmarker)
    if key not in _PADDED_CACHE:
        _PADDED_CACHE[key] = jax.jit(
            lambda d, e, f: preprocess_frames(d, e, f, cfg)
        )
    return _PADDED_CACHE[key](det, ert, frames)


def preprocess_clips_tracked(
    det_params,
    presence,
    ert_model,
    clips: jnp.ndarray,
    cfg: PreprocessConfig | None = None,
    threshold: float = 0.5,
    topk: int = 4,
    return_aux: bool = False,
):
    """[B, T, H, W, 3] u8 -> ([B, T, R, R] ROIs, valid [B, T] bool).

    Robust variant of preprocess_clips (VERDICT r1 missing #2): per-frame
    top-k candidate boxes scored by the face-presence head, then temporal
    tracking (ops/tracking.py) — no-face frames get the carried box and
    valid=False instead of silent garbage; a second face in frame cannot
    hijack the track. ``presence`` comes from preproc_training.load_presence.
    The default (untracked) path is unchanged — its bit-parity with the
    oracle and the golden dump is pinned by tests.
    """
    from lipreading_tpu.ops.tracking import track_boxes

    cfg = cfg or PreprocessConfig()
    B, T, H, W, C = clips.shape
    flat = clips.reshape(B * T, H, W, C)
    gray = roi_ops.grayscale(flat)                             # [BT, H, W]
    feats, head = det_ops.forward_features(
        det_params, roi_ops.resize_frames(gray, det_ops.INPUT)
    )
    pmap = det_ops.presence_logits(presence, feats)            # [BT, 8, 8]
    cand, logit_k = det_ops.decode_boxes_topk(head, H, W, topk, pmap)
    conf = jax.nn.sigmoid(logit_k)
    boxes, valid = track_boxes(
        cand.reshape(B, T, topk, 3), conf.reshape(B, T, topk), threshold
    )
    flat_boxes = boxes.reshape(B * T, 3)
    if cfg.landmarker == "conv":
        from lipreading_tpu.ops.landmarker import predict_batch_conv

        landmarks = predict_batch_conv(ert_model, gray, flat_boxes)
    else:
        landmarks = ert_ops.predict_batch(ert_model, gray, flat_boxes)
    subpix = use_subpixel_roi(cfg)
    mboxes = (mouth_boxes_float(landmarks, cfg.roi_margin) if subpix else
              mouth_boxes_from_landmarks(landmarks, cfg.roi_margin, H, W))
    rois = roi_ops.sample_rois(
        gray, mboxes, cfg.roi_size,
        mean=cfg.normalize_mean, std=cfg.normalize_std, subpixel=subpix,
    ).reshape(B, T, cfg.roi_size, cfg.roi_size)
    if return_aux:
        return rois, valid, {"face_boxes": boxes, "conf": conf}
    return rois, valid


_PADDED_TRACKED_CACHE: dict = {}


def preprocess_padded_tracked(
    det_params,
    presence,
    ert_model,
    frames,
    cfg: PreprocessConfig | None = None,
    bucket: int = 64,
    threshold: float = 0.5,
    topk: int = 4,
):
    """Tracked preprocessing of one video's [N, H, W, 3] frames with N padded
    to a ``bucket`` multiple (one XLA compile per length bucket, like
    preprocess_padded). Returns (roi [N, R, R] f32 numpy, valid [N] bool).
    """
    import numpy as np

    cfg = cfg or PreprocessConfig()
    frames = np.asarray(frames)
    n = frames.shape[0]
    padded = -(-n // bucket) * bucket
    if padded != n:
        frames = np.concatenate(
            [frames, np.repeat(frames[-1:], padded - n, axis=0)]
        )
    key = (frames.shape, cfg.roi_size, cfg.roi_margin, cfg.normalize_mean,
           cfg.normalize_std, cfg.landmarker, threshold, topk)
    if key not in _PADDED_TRACKED_CACHE:
        _PADDED_TRACKED_CACHE[key] = jax.jit(
            lambda d, p, e, f: preprocess_clips_tracked(
                d, p, e, f[None], cfg, threshold=threshold, topk=topk
            )
        )
    rois, valid = _PADDED_TRACKED_CACHE[key](
        det_params, presence, ert_model, jnp.asarray(frames)
    )
    return np.asarray(rois[0][:n]), np.asarray(valid[0][:n])


def preprocess_clips(det_params, ert_model, clips: jnp.ndarray,
                     cfg: PreprocessConfig | None = None) -> jnp.ndarray:
    """[B, T, H, W, 3] -> [B, T, R, R]: flatten time into batch, one program."""
    cfg = cfg or PreprocessConfig()
    B, T, H, W, C = clips.shape
    rois = preprocess_frames(
        det_params, ert_model, clips.reshape(B * T, H, W, C), cfg
    )
    return rois.reshape(B, T, cfg.roi_size, cfg.roi_size)
