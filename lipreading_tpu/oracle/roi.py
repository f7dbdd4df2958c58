"""Mouth-ROI geometry + bilinear sampling spec (CPU/numpy reference).

This file *defines* the arithmetic contract that the fused TPU kernel
(`lipreading_tpu.ops.roi`) must reproduce:

* grayscale: Rec.601 luma on float32 RGB (r*0.299 + g*0.587 + b*0.114),
  matching OpenCV's cvtColor coefficient convention (ref uses cv2.cvtColor,
  SURVEY.md §3 "Mouth-ROI pipeline");
* crop+resize fused into ONE bilinear resample with OpenCV half-pixel-center
  geometry: src = (dst + 0.5) * scale - 0.5, coordinates clamped to the frame
  (cv2.resize INTER_LINEAR convention);
* normalize: (gray/255 - mean) / std with config constants.

The reference does crop -> cv2.resize -> cvtColor -> normalize as separate
passes over small arrays; fusing them into a single sample is mathematically
identical for axis-aligned boxes and is what makes the TPU version one kernel.
"""

from __future__ import annotations

import numpy as np


def grayscale(frame_rgb: np.ndarray) -> np.ndarray:
    """[H, W, 3] uint8/float RGB -> [H, W] float32 Rec.601 luma (0..255)."""
    f = frame_rgb.astype(np.float32)
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


def mouth_box_from_landmarks(
    landmarks: np.ndarray, margin: float = 0.30
) -> tuple[float, float, float]:
    """68-pt landmarks -> square mouth box (x0, y0, size), float geometry.

    Uses mouth points 48-67 (iBUG layout), expands the tight bbox by
    ``margin`` on the longer side, and squares it about the bbox center —
    the reference crops landmarks[48:68] similarly (SURVEY.md §4.1).
    Round with :func:`round_box` before sampling.
    """
    pts = np.asarray(landmarks, dtype=np.float32)[48:68]
    x0, y0 = pts.min(axis=0)
    x1, y1 = pts.max(axis=0)
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    size = max(x1 - x0, y1 - y0) * (1.0 + margin)
    return float(cx - size / 2.0), float(cy - size / 2.0), float(size)


def round_box(
    box: tuple[float, float, float], frame_h: int, frame_w: int
) -> tuple[int, int, int]:
    """Float square box -> integer box clamped inside the frame.

    The reference crops with integer numpy slicing before cv2.resize; this
    defines the rounding deterministically: size and origin round half-up,
    then the origin is shifted so the box fits in the frame.
    """
    x0, y0, size = (float(v) for v in box)
    s = int(np.floor(size + 0.5))
    s = max(2, min(s, frame_h, frame_w))
    xi = int(np.floor(x0 + 0.5))
    yi = int(np.floor(y0 + 0.5))
    xi = max(0, min(xi, frame_w - s))
    yi = max(0, min(yi, frame_h - s))
    return xi, yi, s


def sample_roi(
    gray: np.ndarray,
    box: tuple[int, int, int, int],
    out_size: int = 96,
) -> np.ndarray:
    """Bilinear-resample integer ``box`` (x0, y0, w, h) of a gray frame.

    Exactly equivalent to the reference's crop-then-cv2.resize(INTER_LINEAR):
    for output pixel j the source coordinate *within the crop* is
    (j + 0.5) * (w / out) - 0.5, clamped to the crop interior (so border
    samples clamp at the crop edge, as a materialized crop would), then
    bilinear interpolation.
    """
    H, W = gray.shape
    x0, y0, bw, bh = (int(v) for v in box)
    js = np.arange(out_size, dtype=np.float32)

    def weights(n, off, limit):
        src = (js + 0.5) * (np.float32(n) / out_size) - 0.5
        src = np.clip(src, 0.0, n - 1.0)
        i0 = np.floor(src).astype(np.int32)
        i0 = np.minimum(i0, max(n - 2, 0))
        frac = (src - i0).astype(np.float32)
        i0 = np.clip(i0 + off, 0, limit - 2)
        return i0, frac

    yi, yf = weights(bh, y0, H)
    xi, xf = weights(bw, x0, W)
    g = gray.astype(np.float32)
    top = g[yi][:, xi] * (1 - xf)[None, :] + g[yi][:, xi + 1] * xf[None, :]
    bot = g[yi + 1][:, xi] * (1 - xf)[None, :] + g[yi + 1][:, xi + 1] * xf[None, :]
    return top * (1 - yf)[:, None] + bot * yf[:, None]


def sample_roi_subpixel(
    gray: np.ndarray,
    box: tuple[float, float, float],
    out_size: int = 96,
) -> np.ndarray:
    """Bilinear-resample a FLOAT square ``box`` (x0, y0, size) — no integer
    rounding.

    The integer path (round_box + sample_roi) exists for bit-parity with the
    reference's integer numpy slicing and is mandatory for the ERT/golden
    pipeline. The conv-landmarker path has no such contract, and rounding
    turns its sub-pixel landmark error into discrete 1-px crop flips
    (round_box knife edges) — the failure mode behind its residual
    transcript errors. Sampling at the float box makes landmark noise move
    the crop smoothly instead. Sampling positions are clamped to the box
    interior, then to the frame (replacing round_box's shift-inside-frame).
    """
    H, W = gray.shape
    x0, y0, size = (np.float32(v) for v in box)
    js = np.arange(out_size, dtype=np.float32)

    def weights(start, limit):
        src = (js + 0.5) * (size / np.float32(out_size)) - np.float32(0.5)
        src = np.clip(src, 0.0, size - 1.0) + start
        src = np.clip(src, 0.0, np.float32(limit - 1))
        i0 = np.clip(np.floor(src), 0.0, np.float32(limit - 2))
        frac = (src - i0).astype(np.float32)
        return i0.astype(np.int32), frac

    yi, yf = weights(y0, H)
    xi, xf = weights(x0, W)
    g = gray.astype(np.float32)
    top = g[yi][:, xi] * (1 - xf)[None, :] + g[yi][:, xi + 1] * xf[None, :]
    bot = g[yi + 1][:, xi] * (1 - xf)[None, :] + g[yi + 1][:, xi + 1] * xf[None, :]
    return top * (1 - yf)[:, None] + bot * yf[:, None]


def normalize_roi(
    roi: np.ndarray, mean: float = 0.421, std: float = 0.165
) -> np.ndarray:
    """0..255 gray ROI -> standardized float32."""
    return ((roi.astype(np.float32) / 255.0) - np.float32(mean)) / np.float32(std)


def resize_frame(gray: np.ndarray, out_size: int) -> np.ndarray:
    """Whole-frame resize (detector input) via the same sampling spec."""
    H, W = gray.shape
    return sample_roi(gray, (0, 0, W, H), out_size)
