"""Batched face detection on device (JAX/XLA).

The conv-net equivalent of the reference's per-frame dlib HOG+SVM call
(SURVEY.md §4.1: ``dets = face_detector(gray)``), restructured for TPU: one
strided-conv stack over the whole frame batch, all matmuls on the MXU, no
image pyramid, no per-frame Python.

Weights are shared bit-for-bit with the numpy oracle
(lipreading_tpu/oracle/detector.py); the convolution uses explicit
symmetric padding so both paths compute identical arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lipreading_tpu.oracle.detector import INPUT, LAYERS, SIZE_ANCHOR, STRIDE


def params_to_jax(params: dict[str, np.ndarray]) -> dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in params.items()}


def forward_features(params, gray64: jnp.ndarray):
    """[B, 64, 64] gray (0..255) -> (trunk feats [B, 8, 8, 32],
    head [B, 8, 8, 4]). The trunk features also feed the face-presence
    head (preproc_training.train_presence_head) used for no-face gating."""
    x = ((gray64.astype(jnp.float32) / 255.0) - 0.5) / 0.5
    x = x[..., None]                                   # NHWC
    feats = None
    for name, k, _, _, stride in LAYERS:
        w = params[f"{name}/w"].astype(jnp.float32)    # HWIO
        pad = k // 2
        x = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + params[f"{name}/b"].astype(jnp.float32)
        if name != "head":
            x = jnp.maximum(x, 0.0)
            feats = x
    return feats, x


def forward(params, gray64: jnp.ndarray) -> jnp.ndarray:
    """[B, 64, 64] gray (0..255) -> [B, 8, 8, 4] raw head outputs."""
    return forward_features(params, gray64)[1]


def presence_logits(presence: dict, feats: jnp.ndarray) -> jnp.ndarray:
    """[B, 8, 8, 32] trunk feats -> [B, 8, 8] per-cell face-presence logits.

    The detector's own score head is trained one-hot on always-a-face frames
    (preproc_training.py) and is uncalibrated on faceless input (a white
    frame scores 0.997 — measured); this tiny two-layer head is trained WITH
    negative (faceless/extreme) frames on the frozen trunk, so it gates
    no-face frames without touching the shipped detector weights
    (golden/asset parity). Two layers, not logistic: a constant bright frame
    produces a cell whose trunk features are not linearly separable from a
    bright face center."""
    h = jnp.maximum(
        feats @ presence["w1"].astype(jnp.float32) + presence["b1"], 0.0
    )
    return h @ presence["w2"].astype(jnp.float32) + presence["b2"]


def decode_boxes_topk(head: jnp.ndarray, frame_h: int, frame_w: int, k: int,
                      scores: jnp.ndarray | None = None):
    """[B, 8, 8, 4] -> (boxes [B, K, 3], score_logits [B, K]).

    Top-k cells by ``scores`` (defaults to the regression head's own score
    channel; pass presence logits for calibrated confidence); each cell's
    box decoded with the same arithmetic as decode_boxes."""
    B, gh, gw, _ = head.shape
    s = (head[..., 0] if scores is None else scores).reshape(B, gh * gw)
    top_s, idx = jax.lax.top_k(s, k)                        # [B, K]
    cy_cell = (idx // gw).astype(jnp.float32)
    cx_cell = (idx % gw).astype(jnp.float32)
    flat = head.reshape(B, gh * gw, 4)
    sel = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, K, 4]
    dx = jax.nn.sigmoid(sel[..., 1])
    dy = jax.nn.sigmoid(sel[..., 2])
    size64 = jnp.exp(sel[..., 3]) * SIZE_ANCHOR
    cx64 = (cx_cell + dx) * STRIDE
    cy64 = (cy_cell + dy) * STRIDE
    sx, sy = frame_w / INPUT, frame_h / INPUT
    cx = cx64 * sx
    cy = cy64 * sy
    size = size64 * 0.5 * (sx + sy)
    boxes = jnp.stack([cx - size / 2, cy - size / 2, size], axis=-1)
    return boxes, top_s


def decode_boxes(head: jnp.ndarray, frame_h: int, frame_w: int) -> jnp.ndarray:
    """[B, 8, 8, 4] -> [B, 3] square face boxes (x0, y0, size), float.

    Same arithmetic as the oracle's decode_box; argmax is row-major
    first-maximum in both numpy and XLA.
    """
    B, gh, gw, _ = head.shape
    score = head[..., 0].reshape(B, gh * gw)
    idx = jnp.argmax(score, axis=1)
    cy_cell = (idx // gw).astype(jnp.float32)
    cx_cell = (idx % gw).astype(jnp.float32)
    flat = head.reshape(B, gh * gw, 4)
    sel = jnp.take_along_axis(flat, idx[:, None, None], axis=1)[:, 0, :]  # [B,4]
    dx = jax.nn.sigmoid(sel[:, 1])
    dy = jax.nn.sigmoid(sel[:, 2])
    size64 = jnp.exp(sel[:, 3]) * SIZE_ANCHOR
    cx64 = (cx_cell + dx) * STRIDE
    cy64 = (cy_cell + dy) * STRIDE
    sx, sy = frame_w / INPUT, frame_h / INPUT
    cx = cx64 * sx
    cy = cy64 * sy
    size = size64 * 0.5 * (sx + sy)
    return jnp.stack([cx - size / 2, cy - size / 2, size], axis=1)


def detect(params, gray: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] full-res gray -> [B, 3] face boxes. Resize via ops.roi."""
    from lipreading_tpu.ops.roi import resize_frames

    B, H, W = gray.shape
    return decode_boxes(forward(params, resize_frames(gray, INPUT)), H, W)
