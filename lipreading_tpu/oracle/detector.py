"""Face detector — tiny conv-net localizer, numpy forward (CPU oracle).

Replaces the reference's dlib HOG+SVM frontal detector call site (SURVEY.md
§3 "Face detector"). Per SURVEY.md §7 hard-part #2, a small conv detector
trained to the fixture ground-truth boxes is the TPU-native plan: it turns a
pyramid scan into three strided convolutions that land on the MXU.

Architecture (input: 64x64 gray, normalized to [-1, 1]):
    conv 3x3 s2  1->8   + relu      -> 32x32
    conv 3x3 s2  8->16  + relu      -> 16x16
    conv 3x3 s2 16->32  + relu      -> 8x8
    conv 1x1    32->4               -> 8x8 x (score, dx, dy, log_size)

Decode: the argmax-score cell gives the face center cell; (dx, dy) sigmoid
offsets position the center within the cell (stride 8 on the 64px input);
size = exp(log_size) * 32 px (anchor: face ~half the frame). Coordinates are
then scaled back to the original frame and squared.

The JAX forward in lipreading_tpu/ops/detector.py consumes the same weight
dict; parity tests diff the two element-wise.
"""

from __future__ import annotations

import numpy as np

STRIDE = 8
INPUT = 64
SIZE_ANCHOR = 32.0

LAYERS = (
    ("conv1", 3, 1, 8, 2),
    ("conv2", 3, 8, 16, 2),
    ("conv3", 3, 16, 32, 2),
    ("head", 1, 32, 4, 1),
)


def init_detector(seed: int = 0) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(np.random.SeedSequence([0xFACE, 0xDE7, seed]))
    params: dict[str, np.ndarray] = {}
    for name, k, cin, cout, _ in LAYERS:
        fan_in = k * k * cin
        params[f"{name}/w"] = rng.normal(
            0, np.sqrt(2.0 / fan_in), size=(k, k, cin, cout)
        ).astype(np.float32)
        params[f"{name}/b"] = np.zeros(cout, dtype=np.float32)
    return params


def _conv2d(x: np.ndarray, w: np.ndarray, stride: int) -> np.ndarray:
    """SAME-padded strided conv via im2col matmul. x: [H, W, Cin]."""
    kh, kw, cin, cout = w.shape
    H, W, _ = x.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((ph, ph), (pw, pw), (0, 0)))
    oh, ow = -(-H // stride), -(-W // stride)
    # gather patches [oh, ow, kh, kw, cin]
    iy = (np.arange(oh) * stride)[:, None] + np.arange(kh)[None, :]   # [oh, kh]
    ix = (np.arange(ow) * stride)[:, None] + np.arange(kw)[None, :]   # [ow, kw]
    patches = xp[iy[:, None, :, None], ix[None, :, None, :], :]       # [oh,ow,kh,kw,cin]
    flat = patches.reshape(oh * ow, kh * kw * cin).astype(np.float32)
    out = flat @ w.reshape(kh * kw * cin, cout).astype(np.float32)
    return out.reshape(oh, ow, cout)


def forward(params: dict[str, np.ndarray], gray64: np.ndarray) -> np.ndarray:
    """64x64 gray (0..255) -> [8, 8, 4] raw head outputs."""
    x = ((gray64.astype(np.float32) / 255.0) - 0.5) / 0.5
    x = x[..., None]
    for name, _, _, _, stride in LAYERS:
        x = _conv2d(x, params[f"{name}/w"], stride) + params[f"{name}/b"]
        if name != "head":
            x = np.maximum(x, 0.0)
    return x


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def decode_box(
    head: np.ndarray, frame_h: int, frame_w: int
) -> tuple[float, float, float]:
    """[8, 8, 4] head -> square face box (x0, y0, size) in frame pixels.

    Deterministic argmax (first max in row-major order — numpy and XLA agree).
    """
    score = head[..., 0]
    idx = int(np.argmax(score))
    cy_cell, cx_cell = divmod(idx, score.shape[1])
    dx = _sigmoid(head[cy_cell, cx_cell, 1])
    dy = _sigmoid(head[cy_cell, cx_cell, 2])
    size64 = np.exp(head[cy_cell, cx_cell, 3]) * SIZE_ANCHOR
    cx64 = (cx_cell + dx) * STRIDE
    cy64 = (cy_cell + dy) * STRIDE
    sx, sy = frame_w / INPUT, frame_h / INPUT
    cx, cy = cx64 * sx, cy64 * sy
    size = float(size64) * 0.5 * (sx + sy)
    return float(cx - size / 2.0), float(cy - size / 2.0), float(size)


def detect(params: dict[str, np.ndarray], gray: np.ndarray) -> tuple[float, float, float]:
    """Full-resolution gray frame -> square face box (x0, y0, size)."""
    from lipreading_tpu.oracle.roi import resize_frame

    head = forward(params, resize_frame(gray, INPUT))
    return decode_box(head, gray.shape[0], gray.shape[1])


def save_params(params: dict[str, np.ndarray], path) -> None:
    np.savez_compressed(path, **params)


def load_params(path) -> dict[str, np.ndarray]:
    z = np.load(path)
    return {k: z[k] for k in z.files}
