"""Fused mouth-ROI extraction on device: crop + bilinear resize + grayscale +
normalize over batched frame stacks.

This is the kernel BASELINE.json:5 names directly: "the mouth-ROI
crop/resize/grayscale-normalize stages (today dlib/OpenCV on CPU) become fused
Pallas kernels operating on batched HBM-resident frame stacks".

TPU-first design: per-frame bilinear resampling of an axis-aligned crop is
*separable*, so instead of data-dependent gathers (slow on TPU) each frame's
ROI is computed as two small matmuls with interpolation-weight matrices built
on the fly from the box scalars:

    roi = W_y(box) @ gray_frame @ W_x(box)^T        # [R,H] @ [H,W] @ [W,R]

W_y/W_x each have two nonzeros per row (the bilinear taps) but are materialized
dense — [96,160] tiles are tiny, and the contraction runs on the MXU at full
utilization. The arithmetic (half-pixel centers, crop-interior clamping)
matches lipreading_tpu/oracle/roi.py exactly; parity is asserted in tests.

Three entry points:
    sample_rois          dispatcher (pallas on TPU, XLA einsum elsewhere)
    sample_rois_xla      pure-XLA einsum version (CPU tests, autodiff)
    sample_rois_pallas   Pallas kernel with scalar-prefetched boxes
    resize_frames        fixed full-frame resize (detector input path)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RGB_WEIGHTS = (0.299, 0.587, 0.114)  # Rec.601, matches oracle grayscale


def grayscale(frames: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] RGB (uint8 or float) -> [..., H, W] float32 luma."""
    f = frames.astype(jnp.float32)
    r, g, b = RGB_WEIGHTS
    return f[..., 0] * r + f[..., 1] * g + f[..., 2] * b


def _interp_weights_dense(starts, sizes, src_dim: int, out_size: int,
                          subpixel: bool = False):
    """Batched dense interpolation matrices [N, out, src_dim].

    starts/sizes: [N] crop origin and extent along this axis (int32 boxes by
    default). Matches the oracle: src = (j+0.5)*size/out - 0.5 clamped to the
    crop interior, taps at floor(src) and floor(src)+1 (shifted by start,
    clamped into the frame).

    ``subpixel=True`` takes FLOAT starts/sizes and floors AFTER the shift to
    absolute coordinates (oracle sample_roi_subpixel): the integer-path
    identity floor(src)+start only holds for integer starts. Keeping the two
    formulations separate preserves the default path's bit-parity contract.
    """
    starts = starts.astype(jnp.float32)[:, None]
    sizes = sizes.astype(jnp.float32)[:, None]
    js = jnp.arange(out_size, dtype=jnp.float32)[None, :]
    src = (js + 0.5) * (sizes / out_size) - 0.5
    src = jnp.clip(src, 0.0, sizes - 1.0)
    if subpixel:
        src = jnp.clip(src + starts, 0.0, float(src_dim - 1))
        i0 = jnp.clip(jnp.floor(src), 0.0, float(src_dim - 2))
        frac = src - i0
    else:
        i0 = jnp.minimum(jnp.floor(src), jnp.maximum(sizes - 2.0, 0.0))
        frac = src - i0
        i0 = jnp.clip(i0 + starts, 0.0, float(src_dim - 2))      # [N, out]
    cols = jnp.arange(src_dim, dtype=jnp.float32)[None, None, :]  # [1, 1, src]
    i0e = i0[:, :, None]
    fe = frac[:, :, None]
    w = jnp.where(cols == i0e, 1.0 - fe, 0.0) + jnp.where(cols == i0e + 1.0, fe, 0.0)
    return w  # [N, out, src_dim]


def sample_rois_xla(
    gray: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int = 96,
    mean: float = 0.421,
    std: float = 0.165,
    normalize: bool = True,
    subpixel: bool = False,
) -> jnp.ndarray:
    """[N, H, W] gray + [N, 3] boxes (x0, y0, size) -> [N, R, R] ROIs.

    Boxes are int32 by default; ``subpixel=True`` samples FLOAT boxes
    without rounding (conv-landmarker path, see _interp_weights_dense)."""
    N, H, W = gray.shape
    wy = _interp_weights_dense(boxes[:, 1], boxes[:, 2], H, out_size, subpixel)
    wx = _interp_weights_dense(boxes[:, 0], boxes[:, 2], W, out_size, subpixel)
    g = gray.astype(jnp.float32)
    rows = jnp.einsum("nrh,nhw->nrw", wy, g, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    roi = jnp.einsum("nrw,nsw->nrs", rows, wx, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    if normalize:
        roi = (roi / 255.0 - mean) / std
    return roi


def _roi_kernel(boxes_ref, gray_ref, out_ref, *, H, W, R, mean, std, normalize,
                subpixel=False):
    # boxes ride SMEM transposed as [3, N]: SMEM pads the minor axis per row
    # (512 B granularity), so [N, 3] would burn 512 B per FRAME and trip the
    # 1 MiB SMEM cap at N=2048; [3, N] is three padded rows for any N.
    i = pl.program_id(0)
    x0 = boxes_ref[0, i]
    y0 = boxes_ref[1, i]
    size = boxes_ref[2, i].astype(jnp.float32)

    def interp(start, src_dim):
        js = jax.lax.broadcasted_iota(jnp.int32, (R, src_dim), 0).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, src_dim), 1).astype(jnp.float32)
        src = (js + 0.5) * (size / R) - 0.5
        src = jnp.clip(src, 0.0, size - 1.0)
        if subpixel:
            # float boxes: floor AFTER the shift to absolute coordinates
            # (same arithmetic as _interp_weights_dense subpixel branch)
            src = jnp.clip(src + start.astype(jnp.float32), 0.0,
                           float(src_dim - 1))
            i0 = jnp.clip(jnp.floor(src), 0.0, float(src_dim - 2))
            frac = src - i0
        else:
            i0 = jnp.minimum(jnp.floor(src), jnp.maximum(size - 2.0, 0.0))
            frac = src - i0
            i0 = jnp.clip(i0 + start.astype(jnp.float32), 0.0,
                          float(src_dim - 2))
        return jnp.where(cols == i0, 1.0 - frac, 0.0) + jnp.where(
            cols == i0 + 1.0, frac, 0.0
        )

    wy = interp(y0, H)                                     # [R, H]
    wx = interp(x0, W)                                     # [R, W]
    g = gray_ref[0].astype(jnp.float32)                    # [H, W]
    rows = jnp.dot(wy, g, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)    # [R, W]
    roi = jax.lax.dot_general(
        rows, wx,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                      # [R, R]
    if normalize:
        roi = (roi / 255.0 - mean) / std
    out_ref[0] = roi


def sample_rois_pallas(
    gray: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int = 96,
    mean: float = 0.421,
    std: float = 0.165,
    normalize: bool = True,
    interpret: bool | None = None,
    subpixel: bool = False,
) -> jnp.ndarray:
    """Pallas version of sample_rois_xla: one grid program per frame, boxes
    scalar-prefetched to SMEM, frame DMA'd to VMEM, compute on MXU."""
    N, H, W = gray.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(
        _roi_kernel, H=H, W=W, R=out_size, mean=mean, std=std,
        normalize=normalize, subpixel=subpixel
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, out_size, out_size), lambda i, *_: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, out_size, out_size), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * out_size * W * (H + out_size),
            bytes_accessed=N * (H * W + out_size * out_size) * 4,
            transcendentals=0,
        ),
    )(boxes.astype(jnp.float32 if subpixel else jnp.int32).T,
      gray.astype(jnp.float32))


def sample_rois(gray, boxes, out_size: int = 96, **kw):
    """Dispatch: Pallas on TPU, XLA einsum elsewhere (identical arithmetic)."""
    if jax.default_backend() == "tpu":
        return sample_rois_pallas(gray, boxes, out_size, **kw)
    return sample_rois_xla(gray, boxes, out_size, **kw)


@functools.partial(jax.jit, static_argnums=(1,))
def resize_frames(gray: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """[N, H, W] -> [N, out, out] full-frame resize with constant weights.

    The detector input path: weights depend only on (H, W, out), so they are
    compile-time constants and XLA folds the whole thing into two matmuls.
    """
    N, H, W = gray.shape
    wy = _np_interp_weights(H, out_size)
    wx = _np_interp_weights(W, out_size)
    g = gray.astype(jnp.float32)
    rows = jnp.einsum("rh,nhw->nrw", jnp.asarray(wy), g,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("nrw,sw->nrs", rows, jnp.asarray(wx),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def _np_interp_weights(src_dim: int, out_size: int) -> np.ndarray:
    """Host-side constant interpolation matrix [out, src] (full-frame box)."""
    js = np.arange(out_size, dtype=np.float32)
    src = (js + 0.5) * (src_dim / out_size) - 0.5
    src = np.clip(src, 0.0, src_dim - 1.0)
    i0 = np.minimum(np.floor(src), src_dim - 2).astype(np.int32)
    frac = (src - i0).astype(np.float32)
    w = np.zeros((out_size, src_dim), dtype=np.float32)
    w[np.arange(out_size), i0] = 1.0 - frac
    w[np.arange(out_size), i0 + 1] += frac
    return w
