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


def patchify_init(key, cfg: ModelConfig):
    """MXU-shaped stem (cfg.model.frontend="patchify"; round-3 MFU work).

    The reference-shaped conv3d stack above is 96.6%% of the flagship's
    forward FLOPs yet runs at 16.5%% MFU (BASELINE.md round-3 profile): its
    C_out of 32/64/96 leaves MXU lanes half-empty and the C_in=1 first conv
    cannot tile at all. This stem reaches the same [B, T, D] contract through
    ops the MXU likes:

        [B,T,96,96,1] -> 8x8 space-to-depth -> [B,T,12,12,64]
                      -> concat (t-1,t,t+1)  -> [B,T,12,12,192]
                      -> dense 192->P (tubelet embed as ONE matmul) -> GN -> relu
                      -> pool(1,2,2) -> [B,T,6,6,P]
                      -> conv3d(3,3,3) P->P -> GN -> relu   (contraction 27P)
                      -> pool(1,2,2) -> [B,T,3,3,P]
                      -> conv3d(3,3,3) P->P -> GN -> relu
                      -> flatten -> dense 9P->D -> highway x N

    ~175 MFLOP/frame vs the conv stack's 237 with every contraction and
    output dimension >= 128. Time stride stays 1 (CTC frame rate). The
    conv3d stem remains the parity/importer anchor; this one needs retrained
    weights (scripts/train.py model.frontend=patchify).
    """
    P = cfg.patch_dim
    ps = cfg.patch_size
    ks = jax.random.split(key, 6 + cfg.highway_layers)
    return {
        "embed": nn.dense_init(ks[0], 3 * ps * ps, P),
        "gn_e": nn.groupnorm_init(P),
        "convA": nn.conv3d_init(ks[1], (3, 3, 3), P, P),
        "gnA": nn.groupnorm_init(P),
        "convB": nn.conv3d_init(ks[2], (3, 3, 3), P, P),
        "gnB": nn.groupnorm_init(P),
        "proj": nn.dense_init(ks[3], P * (96 // ps // 4) ** 2,
                              cfg.frontend_dim),
        "highway": [
            nn.highway_init(ks[4 + i], cfg.frontend_dim)
            for i in range(cfg.highway_layers)
        ],
    }


def patchify_apply(p, rois, cfg: ModelConfig, dtype=None, dropout_rng=None,
                   rate: float = 0.0):
    """[B, T, R, R] -> [B, T, D]; see patchify_init."""
    if rois.ndim == 5:
        rois = rois[..., 0]
    x = rois.astype(dtype or jnp.float32)
    B, T, R, _ = x.shape
    ps = cfg.patch_size
    g = R // ps
    # space-to-depth: [B, T, g, g, ps*ps]
    x = x.reshape(B, T, g, ps, g, ps).transpose(0, 1, 2, 4, 3, 5)
    x = x.reshape(B, T, g, g, ps * ps)
    # temporal window (t-1, t, t+1), zero-padded at the edges like a SAME
    # k_t=3 conv — the tubelet embed below then sees 3*ps*ps inputs
    z = jnp.zeros_like(x[:, :1])
    x = jnp.concatenate(
        [jnp.concatenate([z, x[:, :-1]], axis=1), x,
         jnp.concatenate([x[:, 1:], z], axis=1)],
        axis=-1,
    )
    fw = cfg.framewise_norm
    x = jax.nn.relu(nn.groupnorm(p["gn_e"], nn.dense(p["embed"], x, dtype=dtype),
                                 framewise=fw))
    x = nn.maxpool3d(x.reshape(B, T, g, g, -1))
    x = jax.nn.relu(nn.groupnorm(p["gnA"], nn.conv3d(p["convA"], x, dtype=dtype),
                                 framewise=fw))
    x = nn.maxpool3d(x)
    x = jax.nn.relu(nn.groupnorm(p["gnB"], nn.conv3d(p["convB"], x, dtype=dtype),
                                 framewise=fw))
    x = x.reshape(B, T, -1)
    x = nn.dense(p["proj"], x, dtype=dtype)
    for hp in p["highway"]:
        x = nn.highway(hp, x, dtype=dtype)
    x = nn.dropout(dropout_rng, x, rate, deterministic=dropout_rng is None)
    return x


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


def frontend_apply(p, rois, dtype=None, dropout_rng=None, rate=0.0,
                   framewise_norm: bool = False):
    """[B, T, R, R] (or [B, T, R, R, 1]) -> [B, T, D] features.

    ``dropout_rng``: pass a key during training to enable dropout (rate from
    ModelConfig); None disables (eval/inference). ``framewise_norm``: see
    nn.groupnorm — default-off keeps torch-reference GroupNorm semantics
    (the parity anchor).
    """
    if rois.ndim == 4:
        rois = rois[..., None]
    x = rois.astype(dtype or jnp.float32)
    x = nn.conv3d(p["conv0"], x, strides=(1, 2, 2), dtype=dtype)
    x = jax.nn.relu(nn.groupnorm(p["gn0"], x, framewise=framewise_norm))
    x = nn.maxpool3d(x)
    x = nn.conv3d(p["conv1"], x, dtype=dtype)
    x = jax.nn.relu(nn.groupnorm(p["gn1"], x, framewise=framewise_norm))
    x = nn.maxpool3d(x)
    x = nn.conv3d(p["conv2"], x, dtype=dtype)
    x = jax.nn.relu(nn.groupnorm(p["gn2"], x, framewise=framewise_norm))
    x = nn.maxpool3d(x)
    B, T = x.shape[:2]
    x = x.reshape(B, T, -1)
    x = nn.dense(p["proj"], x, dtype=dtype)
    for hp in p["highway"]:
        x = nn.highway(hp, x, dtype=dtype)
    x = nn.dropout(dropout_rng, x, rate, deterministic=dropout_rng is None)
    return x
