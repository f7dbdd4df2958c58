"""3D-CNN visual frontend (ref: LCANet-style Conv3d stack — SURVEY.md §3,
papers PAPERS.md LCANet 1803.04988).

Spatiotemporal conv stack over the ROI sequence:

    [B, T, 96, 96, 1] -> conv3d(3,5,5)/s(1,2,2) C0 -> GN -> relu -> pool(1,2,2)
                      -> conv3d(3,5,5)          C1 -> GN -> relu -> pool(1,2,2)
                      -> conv3d(3,3,3)          C2 -> GN -> relu -> pool(1,2,2)
                      -> flatten spatial -> dense -> highway x N
                      -> [B, T, D]

Time stride is 1 everywhere (CTC needs frame-rate features); spatial dims
collapse 96 -> 3. All convs are SAME-padded in T so T is preserved. Channel
counts and dims come from ModelConfig. GroupNorm replaces the reference's
BatchNorm3d (batch-size independent => no cross-replica stat sync under DP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lipreading_tpu.config import ModelConfig
from lipreading_tpu.models import nn


def frontend_init(key, cfg: ModelConfig):
    c0, c1, c2 = cfg.frontend_channels
    ks = jax.random.split(key, 5 + cfg.highway_layers)
    p = {
        "conv0": nn.conv3d_init(ks[0], (3, 5, 5), 1, c0),
        "gn0": nn.groupnorm_init(c0),
        "conv1": nn.conv3d_init(ks[1], (3, 5, 5), c0, c1),
        "gn1": nn.groupnorm_init(c1),
        "conv2": nn.conv3d_init(ks[2], (3, 3, 3), c1, c2),
        "gn2": nn.groupnorm_init(c2),
        # 96 -> conv s2 -> 48 -> pool -> 24 -> conv -> 24 -> pool -> 12
        #    -> conv -> 12 -> pool -> 6  => 6x6 spatial
        "proj": nn.dense_init(ks[3], c2 * 6 * 6, cfg.frontend_dim),
        "highway": [
            nn.highway_init(ks[4 + i], cfg.frontend_dim)
            for i in range(cfg.highway_layers)
        ],
    }
    return p


def frontend_apply(p, rois, dtype=None, dropout_rng=None, rate=0.0):
    """[B, T, R, R] (or [B, T, R, R, 1]) -> [B, T, D] features.

    ``dropout_rng``: pass a key during training to enable dropout (rate from
    ModelConfig); None disables (eval/inference).
    """
    if rois.ndim == 4:
        rois = rois[..., None]
    x = rois.astype(dtype or jnp.float32)
    x = nn.conv3d(p["conv0"], x, strides=(1, 2, 2), dtype=dtype)
    x = jax.nn.relu(nn.groupnorm(p["gn0"], x))
    x = nn.maxpool3d(x)
    x = nn.conv3d(p["conv1"], x, dtype=dtype)
    x = jax.nn.relu(nn.groupnorm(p["gn1"], x))
    x = nn.maxpool3d(x)
    x = nn.conv3d(p["conv2"], x, dtype=dtype)
    x = jax.nn.relu(nn.groupnorm(p["gn2"], x))
    x = nn.maxpool3d(x)
    B, T = x.shape[:2]
    x = x.reshape(B, T, -1)
    x = nn.dense(p["proj"], x, dtype=dtype)
    for hp in p["highway"]:
        x = nn.highway(hp, x, dtype=dtype)
    x = nn.dropout(dropout_rng, x, rate, deterministic=dropout_rng is None)
    return x
