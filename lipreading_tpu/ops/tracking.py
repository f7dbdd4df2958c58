"""Temporal face-box tracking: threshold + carry-forward + multi-face
disambiguation, fully on device.

The reference's preprocessing loop takes ``dets[0]`` and skips frames where
dlib finds no face (SURVEY.md §4.1 / §3 "Face detector": 0..N detections per
frame). This module is the batched equivalent: per frame the detector emits
top-K candidate boxes with presence confidences (ops/detector.py
decode_boxes_topk + presence head); a ``lax.scan`` over time then

* keeps the candidate nearest the previous frame's box among those above
  the confidence threshold (multi-face disambiguation via temporal
  consistency — a second face in the frame never hijacks the track);
* carries the last confident box forward through no-face frames (the
  reference's skip-frame semantics, without dropping the frame from the
  tensor — downstream masks use the ``valid`` flags);
* back-fills a no-face *prefix* from the first confident box (reverse scan).

Everything is static-shape and jit-compatible; no per-frame Python.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e30


def track_boxes(boxes: jnp.ndarray, conf: jnp.ndarray, threshold: float,
                init_state=None, return_state: bool = False):
    """boxes [B, T, K, 3] candidates, conf [B, T, K] confidence in (0, 1)
    (sigmoid of presence logits). Returns (tracked [B, T, 3] float,
    valid [B, T] bool) — valid marks frames with a confident detection;
    invalid frames hold the carried (or back-filled) box.

    ``init_state``/``return_state`` chain the track across chunk boundaries
    (streaming): state is (have [B] bool, box [B, 3]) — the last confident
    box of the previous chunk. With a live prior state, a chunk-leading
    no-face run carries that box instead of back-filling.
    """
    B, T, K, _ = boxes.shape

    def centers(b):
        return jnp.stack([b[..., 0] + b[..., 2] / 2,
                          b[..., 1] + b[..., 2] / 2], axis=-1)

    def fwd(carry, xs):
        have_prev, prev_box = carry                  # [B], [B, 3]
        b_t, c_t = xs                                # [B, K, 3], [B, K]
        ok = c_t >= threshold                        # [B, K]
        d = jnp.linalg.norm(
            centers(b_t) - centers(prev_box)[:, None, :], axis=-1
        )                                            # [B, K]
        # with a track: nearest confident candidate; without: most confident
        pick_score = jnp.where(have_prev[:, None], -d, c_t)
        pick_score = jnp.where(ok, pick_score, NEG)
        k = jnp.argmax(pick_score, axis=1)           # [B]
        chosen = jnp.take_along_axis(b_t, k[:, None, None], axis=1)[:, 0]
        any_ok = ok.any(axis=1)                      # [B]
        box = jnp.where(any_ok[:, None], chosen, prev_box)
        have = have_prev | any_ok
        return (have, box), (box, any_ok, have)

    # scan over time (move T to the front)
    bT = jnp.moveaxis(boxes, 1, 0)                   # [T, B, K, 3]
    cT = jnp.moveaxis(conf, 1, 0)                    # [T, B, K]
    init = (init_state if init_state is not None
            else (jnp.zeros((B,), bool), jnp.zeros((B, 3), boxes.dtype)))
    final_state, (out, valid, have_so_far) = jax.lax.scan(fwd, init, (bT, cT))

    # back-fill ONLY the no-face prefix (frames with no confident detection
    # at or before them) with the first confident box; frames after a valid
    # detection already hold the forward-carried box
    def bwd(carry, xs):
        next_box = carry                             # nearest valid box at > t
        box_t, valid_t, have_t = xs
        filled = jnp.where(have_t[:, None], box_t, next_box)
        nb = jnp.where(valid_t[:, None], box_t, next_box)
        return nb, filled

    _, out_rev = jax.lax.scan(
        bwd, out[-1], (out[::-1], valid[::-1], have_so_far[::-1])
    )
    tracked = jnp.moveaxis(out_rev[::-1], 0, 1)      # [B, T, 3]
    valid_bt = jnp.moveaxis(valid, 0, 1)
    if return_state:
        return tracked, valid_bt, final_state
    return tracked, valid_bt


def compact_valid_frames(x: jnp.ndarray, valid: jnp.ndarray,
                         lengths: jnp.ndarray):
    """Stable-partition each sample's valid frames to the front — the
    reference's skip-frame semantics ("no detection -> frame dropped",
    SURVEY.md §4.1) under static shapes: instead of a ragged delete, invalid
    frames move behind the new length and downstream masking ignores them.

    x: [B, T, ...] per-frame data; valid: [B, T] bool; lengths: [B] valid
    frame counts (frames at or beyond a sample's length are dropped too).
    Returns (x_compacted, new_lengths). Jit-compatible (one argsort).
    """
    B, T = valid.shape
    pos = jnp.arange(T)[None, :]
    keep = valid & (pos < lengths[:, None])
    # stable argsort on a 0/1 key: kept frames first, original order preserved
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=1, stable=True)
    idx = order.reshape(B, T, *([1] * (x.ndim - 2)))
    return (
        jnp.take_along_axis(x, idx, axis=1),
        keep.sum(axis=1).astype(lengths.dtype),
    )
