"""Functional layer library.

Thin init/apply pairs over jnp — the reference leans on torch.nn Modules
(SURVEY.md §3); here parameters are explicit pytrees so pjit shardings and
the torch weight importer can address every array by path. Params are always
fp32; ``dtype`` casts activations (bf16 on TPU keeps the MXU fed at full
rate while fp32 master weights preserve training quality).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def uniform_init(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def dense_init(key, in_dim: int, out_dim: int, bias: bool = True):
    """Kaiming-uniform like torch.nn.Linear (importer-compatible layout:
    w is [in, out] = torch weight.T)."""
    k1, k2 = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"w": uniform_init(k1, (in_dim, out_dim), scale)}
    if bias:
        p["b"] = uniform_init(k2, (out_dim,), scale)
    return p


def dense(p, x, dtype=None):
    w = p["w"].astype(dtype) if dtype else p["w"]
    y = x @ w
    if "b" in p:
        b = p["b"].astype(dtype) if dtype else p["b"]
        y = y + b
    return y


def layernorm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layernorm(p, x, eps: float = 1e-5):
    """LayerNorm in fp32 (numerics-sensitive), result cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def groupnorm_init(channels: int):
    return {"scale": jnp.ones((channels,), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32)}


def groupnorm(p, x, groups: int = 8, eps: float = 1e-5,
              framewise: bool = False):
    """GroupNorm over the trailing channel axis of [..., C].

    Batch-independent (unlike the reference's BatchNorm3d), so per-device
    statistics under data parallelism need no cross-replica sync.

    ``framewise`` (x: [B, T, ...spatial..., C]): statistics per (sample,
    FRAME) instead of per sample. Default-off stats pool over the time
    axis, so zero-padded frames dilute them and the valid frames' features
    depend on how far the batch was padded (measured: CTC logits shift by
    ~1 nat between pad buckets 64/128 and a release transcript flipped) —
    exactly like the torch reference's GroupNorm, which the parity-gated
    conv3d path must keep. Framewise stats make every frame's features a
    function of that frame alone: pad-bucket- and streaming-window-
    invariant by construction (cfg.model.framewise_norm).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    C = xf.shape[-1]
    g = math.gcd(groups, C)
    lead = xf.shape[:2] if framewise else xf.shape[:1]
    xg = xf.reshape(*lead, -1, g, C // g)         # [B(,T), S, G, C/G]
    ax = (len(lead), len(lead) + 2)               # (spatial, channel-in-group)
    mean = xg.mean(axis=ax, keepdims=True)
    var = xg.var(axis=ax, keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(xf.shape)
    return (y * p["scale"] + p["bias"]).astype(orig_dtype)


def embedding_init(key, vocab: int, dim: int):
    return {"table": jax.random.normal(key, (vocab, dim), jnp.float32)}


def embedding(p, ids, dtype=None):
    t = p["table"].astype(dtype) if dtype else p["table"]
    return jnp.take(t, ids, axis=0)


def conv3d_init(key, kernel: tuple[int, int, int], cin: int, cout: int):
    """[kT, kH, kW, Cin, Cout] (DHWIO), Kaiming-uniform fan-in."""
    k1, k2 = jax.random.split(key)
    fan_in = int(np.prod(kernel)) * cin
    scale = 1.0 / math.sqrt(fan_in)
    return {
        "w": uniform_init(k1, (*kernel, cin, cout), scale),
        "b": uniform_init(k2, (cout,), scale),
    }


def conv3d(p, x, strides=(1, 1, 1), padding="SAME", dtype=None):
    """x: [B, T, H, W, C] NDHWC."""
    w = p["w"].astype(dtype) if dtype else p["w"]
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )
    b = p["b"].astype(dtype) if dtype else p["b"]
    return y + b


def maxpool3d(x, window=(1, 2, 2), strides=None):
    strides = strides or window
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *strides, 1),
        padding="VALID",
    )


def highway_init(key, dim: int):
    k1, k2 = jax.random.split(key)
    p = {"h": dense_init(k1, dim, dim), "t": dense_init(k2, dim, dim)}
    # bias transform gate toward carry at init (standard highway trick)
    p["t"]["b"] = p["t"]["b"] - 2.0
    return p


def highway(p, x, dtype=None):
    h = jax.nn.relu(dense(p["h"], x, dtype))
    t = jax.nn.sigmoid(dense(p["t"], x, dtype))
    return h * t + x * (1.0 - t)


def dropout(key, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def length_mask(lengths, max_len: int):
    """[B] lengths -> [B, max_len] bool validity mask."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def flip_sequences(x, lengths):
    """Reverse [B, T, ...] within each sample's valid length (padding stays).

    Needed for the backward direction of the bi-GRU so padded positions don't
    leak into valid states (torch pack_padded equivalent).
    """
    B, T = x.shape[:2]
    idx = lengths[:, None] - 1 - jnp.arange(T)[None, :]
    idx = jnp.clip(idx, 0, T - 1)
    return jnp.take_along_axis(
        x, idx.reshape(B, T, *([1] * (x.ndim - 2))).astype(jnp.int32), axis=1
    )
