"""Batched ERT landmark cascade on device (JAX/XLA).

SURVEY.md §7 ranks dlib-ERT-on-TPU the #1 hard part: "data-dependent gathers,
tiny FLOPs, awkward for the MXU. Plan A: ... vectorize tree traversal across
(batch x trees) with gather indices precomputed per cascade stage."

This is Plan A, expressed at the XLA level: cascade stages and tree depth are
static Python loops (unrolled into the jit program — S*D is ~40 steps); within
a step everything is a [B, ...]-shaped gather/compare, so the batch dimension
saturates the VPU and the gathers hit HBM coalesced per frame. No Python
executes per frame at runtime.

The model arrays come straight from the oracle's ERTModel (shared weights);
arithmetic matches lipreading_tpu/oracle/ert.py bit-for-bit: nearest-pixel
lookup via floor(x + 0.5), heap-ordered node descent, per-stage pool gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lipreading_tpu.oracle.ert import ERTModel


def model_to_jax(model: ERTModel) -> dict[str, jnp.ndarray]:
    return {
        "mean_shape": jnp.asarray(model.mean_shape),
        "anchors": jnp.asarray(model.anchors),
        "offsets": jnp.asarray(model.offsets),
        "feat1": jnp.asarray(model.feat1),
        "feat2": jnp.asarray(model.feat2),
        "thresh": jnp.asarray(model.thresh),
        "leaves": jnp.asarray(model.leaves),
    }


def predict_batch(
    m: dict[str, jnp.ndarray],
    gray: jnp.ndarray,
    boxes: jnp.ndarray,
) -> jnp.ndarray:
    """[B, H, W] gray + [B, 3] float boxes (x0, y0, size) -> [B, 68, 2] px.

    One fused jit program for the whole cascade; B is the only runtime axis.
    """
    B, H, W = gray.shape
    S, P = m["anchors"].shape
    K, nn = m["feat1"].shape[1:]
    depth = int(np.log2(nn + 1))

    gray_flat = gray.reshape(B, H * W).astype(jnp.float32)
    origin = boxes[:, :2].astype(jnp.float32)[:, None, :]       # [B, 1, 2]
    size = boxes[:, 2].astype(jnp.float32)[:, None, None]       # [B, 1, 1]
    shape = jnp.broadcast_to(m["mean_shape"][None], (B, 68, 2)).astype(jnp.float32)
    ks = jnp.arange(K)[None, :]                                 # [1, K]

    for s in range(S):
        # stage-s pool gather: positions anchored to the current shape
        pos = (shape[:, m["anchors"][s]] + m["offsets"][s][None]) * size + origin
        px = jnp.clip(jnp.floor(pos[..., 0] + 0.5).astype(jnp.int32), 0, W - 1)
        py = jnp.clip(jnp.floor(pos[..., 1] + 0.5).astype(jnp.int32), 0, H - 1)
        vals = jnp.take_along_axis(gray_flat, py * W + px, axis=1)  # [B, P]

        # descend all K trees for all B frames in lockstep
        f1s, f2s, ths = m["feat1"][s], m["feat2"][s], m["thresh"][s]
        node = jnp.zeros((B, K), dtype=jnp.int32)
        for _ in range(depth):
            f1 = f1s[ks, node]                                   # [B, K]
            f2 = f2s[ks, node]
            th = ths[ks, node]
            v1 = jnp.take_along_axis(vals, f1, axis=1)
            v2 = jnp.take_along_axis(vals, f2, axis=1)
            node = 2 * node + 1 + ((v1 - v2) > th).astype(jnp.int32)
        leaf = node - nn                                          # [B, K]

        delta = m["leaves"][s][ks, leaf]                          # [B, K, 136]
        shape = shape + jnp.sum(delta, axis=1).reshape(B, 68, 2)

    return shape * size + origin
