"""Conv landmarker — MXU-friendly alternative to the ERT cascade.

The ERT (ops/ert.py) is the oracle-paired landmarker and stays the default.
This module is the SURVEY.md §7 plan-B path taken as an *optimization*: a
small convnet over the detector's face crop regresses all 68 points in one
shot — three matmul-shaped ops (crop-resize einsums + strided convs + dense
head) instead of the cascade's ten gather+compare stages. It is DISTILLED
from the shipped ERT's outputs (preproc_training.train_conv_landmarker), so
the acceptance gate is the survey's: landmark L2 / downstream-ROI agreement
with the ERT path, not bit parity (SURVEY.md §3 "68-pt landmark regressor",
gate framing in §7 hard-part #1 plan B).

Select with cfg.preprocess.landmarker = "conv" (weights from
preproc_training.load_landmarker); default "ert" keeps the golden-dump /
oracle-parity pipeline bit-untouched.

Architecture (input: the detector box cropped+resized to 64x64 gray):
    conv 3x3 s2   1->16  + relu     -> 32x32
    conv 3x3 s2  16->32  + relu     -> 16x16
    conv 3x3 s2  32->64  + relu     -> 8x8
    conv 3x3 s2  64->96  + relu     -> 4x4
    flatten -> dense 256 + relu -> dense 136
Outputs are landmark coordinates in box units (origin = box corner, scale =
box size; the mean shape is folded into the output bias at init), mapped
back to frame pixels with the same rounded box used for the crop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CROP = 64

LAYERS = (
    ("conv1", 3, 1, 16, 2),
    ("conv2", 3, 16, 32, 2),
    ("conv3", 3, 32, 64, 2),
    ("conv4", 3, 64, 96, 2),
)
FC_DIM = 256


def init_landmarker(seed: int = 0,
                    mean_shape: np.ndarray | None = None,
                    width: float = 1.0) -> dict:
    """Weights as a flat numpy dict (same convention as the detector).

    ``width`` scales every channel count (multiples of 8; FC multiples of
    64) — forward() reads shapes from the params, so wider variants are
    drop-in. width=1.0 reproduces the original shapes and init draws."""
    rng = np.random.default_rng(np.random.SeedSequence([0x1A9D, seed]))
    params: dict[str, np.ndarray] = {}
    couts = [max(8, int(c * width + 0.5) // 8 * 8)
             for _, _, _, c, _ in LAYERS]
    cins = [LAYERS[0][2]] + couts[:-1]
    for (name, k, _, _, _), cin, cout in zip(LAYERS, cins, couts):
        fan_in = k * k * cin
        params[f"{name}/w"] = rng.normal(
            0, np.sqrt(2.0 / fan_in), size=(k, k, cin, cout)
        ).astype(np.float32)
        params[f"{name}/b"] = np.zeros(cout, dtype=np.float32)
    fc_dim = max(64, int(FC_DIM * width + 0.5) // 64 * 64)
    flat = (CROP // 16) * (CROP // 16) * couts[-1]
    params["fc1/w"] = rng.normal(
        0, np.sqrt(2.0 / flat), size=(flat, fc_dim)
    ).astype(np.float32)
    params["fc1/b"] = np.zeros(fc_dim, dtype=np.float32)
    # near-zero output weights + mean-shape bias: the net starts AT the mean
    # shape (like the ERT cascade's initial estimate) and learns residuals
    params["out/w"] = rng.normal(0, 1e-3, size=(fc_dim, 136)).astype(np.float32)
    params["out/b"] = (
        mean_shape.astype(np.float32).reshape(136)
        if mean_shape is not None else np.full(136, 0.5, np.float32)
    )
    return params


def params_to_jax(params: dict) -> dict:
    return {k: jnp.asarray(v) for k, v in params.items()}


def forward(params, crop: jnp.ndarray) -> jnp.ndarray:
    """[B, 64, 64] gray crop (0..255) -> [B, 68, 2] in box units."""
    x = ((crop.astype(jnp.float32) / 255.0) - 0.5) / 0.5
    x = x[..., None]                                   # NHWC
    for name, k, _, _, stride in LAYERS:
        pad = k // 2
        x = jax.lax.conv_general_dilated(
            x, params[f"{name}/w"].astype(jnp.float32),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + params[f"{name}/b"].astype(jnp.float32)
        x = jnp.maximum(x, 0.0)
    x = x.reshape(x.shape[0], -1)
    x = jnp.maximum(x @ params["fc1/w"] + params["fc1/b"], 0.0)
    out = x @ params["out/w"] + params["out/b"]
    return out.reshape(-1, 68, 2)


def round_face_boxes(boxes: jnp.ndarray, frame_h: int, frame_w: int):
    """Float (x0, y0, size) -> clipped int boxes, shared by train + predict."""
    s = jnp.clip(jnp.floor(boxes[:, 2] + 0.5).astype(jnp.int32), 2,
                 min(frame_h, frame_w))
    x0 = jnp.clip(jnp.floor(boxes[:, 0] + 0.5).astype(jnp.int32), 0,
                  frame_w - s)
    y0 = jnp.clip(jnp.floor(boxes[:, 1] + 0.5).astype(jnp.int32), 0,
                  frame_h - s)
    return jnp.stack([x0, y0, s], axis=1)


def predict_batch_conv(params, gray: jnp.ndarray,
                       boxes: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] gray + [B, 3] float face boxes -> [B, 68, 2] px landmarks.

    Drop-in for ops.ert.predict_batch (same signature/geometry contract)."""
    from lipreading_tpu.ops.roi import sample_rois_xla

    B, H, W = gray.shape
    ibox = round_face_boxes(boxes, H, W)
    crop = sample_rois_xla(gray, ibox, CROP, normalize=False)
    lm = forward(params, crop)                               # box units
    origin = ibox[:, :2].astype(jnp.float32)[:, None, :]
    size = ibox[:, 2].astype(jnp.float32)[:, None, None]
    return origin + lm * size
