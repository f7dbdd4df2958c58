"""Ring attention: time-axis (sequence-parallel) sharding of the transformer
encoder over the mesh ``model`` axis (SURVEY.md §6 long-context extension;
the round-1 design note in parallel/__init__.py, now implemented).

Why: clips longer than one chip's HBM allows (T x T attention + T-length
activations) split their TIME axis across devices. Each device holds a
T/n block of q/k/v; key/value blocks rotate around the ICI ring
(``jax.lax.ppermute``) while a streaming (online-softmax / flash-style)
accumulator keeps the attention numerically exact — no device ever holds
the full [T, T] score matrix or the full sequence.

Everything position-wise (projections, LayerNorm, MLP, residuals) needs no
communication and runs on the local block; attention is the only collective.
Math is EXACTLY standard masked softmax attention — the CPU-mesh test pins
ring == unsharded encoder to float tolerance.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lipreading_tpu.models import nn

NEG_INF = -1e30


def _ring_attend(q, k, v, kv_valid, axis_name: str, vma=None):
    """Exact attention with k/v blocks rotating around the ring.

    q, k, v: [B, Tl, H, Dh] local blocks; kv_valid: [B, Tl] key validity.
    Returns [B, Tl, H, Dh]. Online-softmax accumulation: running max m,
    denominator l, numerator acc are corrected as each incoming block
    raises the max — bitwise-stable regardless of ring order.

    ``vma``: the mesh axes q/k/v are device-varying over (just the ring axis
    standalone; (data, ring) when the batch dim is sharded too) — the scan
    carry's accumulators must be declared varying over the same set.
    """
    B, Tl, H, Dh = q.shape
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    scale = 1.0 / math.sqrt(Dh)
    vma = (axis_name,) if vma is None else tuple(vma)

    # initial accumulators are device-varying (each shard accumulates its
    # own), which shard_map's vma typing requires us to declare explicitly
    m0 = jax.lax.pcast(jnp.full((B, H, Tl), NEG_INF, jnp.float32),
                      vma, to='varying')
    l0 = jax.lax.pcast(jnp.zeros((B, H, Tl), jnp.float32), vma,
                      to='varying')
    acc0 = jax.lax.pcast(jnp.zeros((B, H, Tl, Dh), jnp.float32), vma,
                        to='varying')

    def step(carry, _):
        k_blk, v_blk, valid_blk, m, l, acc = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k_blk) * scale
        s = jnp.where(valid_blk[:, None, None, :], s.astype(jnp.float32),
                      NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p.astype(v_blk.dtype), v_blk
        ).astype(jnp.float32)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        valid_blk = jax.lax.ppermute(valid_blk, axis_name, perm)
        return (k_blk, v_blk, valid_blk, m_new, l, acc), None

    (_, _, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, kv_valid, m0, l0, acc0), None, length=n
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]             # [B, H, Tl, Dh]
    return jnp.moveaxis(out, 1, 2).astype(q.dtype)           # [B, Tl, H, Dh]


def _encoder_block_local(p, x_blk, lengths, rng, heads: int, t_local: int,
                         axis_name: str, dtype=None, rate: float = 0.0,
                         vma=None):
    """Per-shard encoder body (runs under shard_map).

    x_blk: [B, Tl, in] local time block; lengths: [B] global lengths.
    rng: per-shard dropout key (already folded with the shard index) or None
    for deterministic eval.
    """
    B, Tl, _ = x_blk.shape
    idx = jax.lax.axis_index(axis_name)
    start = idx * t_local
    h = nn.dense(p["proj"], x_blk, dtype)
    pos = jax.lax.dynamic_slice_in_dim(p["pos"], start, t_local, axis=0)
    h = h + pos[None].astype(h.dtype)
    # local block's key validity against the GLOBAL lengths
    gpos = start + jnp.arange(Tl)
    kv_valid = gpos[None, :] < lengths[:, None]              # [B, Tl]

    det = rng is None
    keys = (jax.random.split(rng, 2 * len(p["layers"]))
            if not det else [None] * (2 * len(p["layers"])))

    def drop(k, v):
        return nn.dropout(k, v, rate, deterministic=det)

    for i, lp in enumerate(p["layers"]):
        hn = nn.layernorm(lp["ln1"], h)
        ap = lp["attn"]
        D = hn.shape[-1]
        Dh = D // heads
        q = nn.dense(ap["q"], hn, dtype).reshape(B, Tl, heads, Dh)
        k = nn.dense(ap["k"], hn, dtype).reshape(B, Tl, heads, Dh)
        v = nn.dense(ap["v"], hn, dtype).reshape(B, Tl, heads, Dh)
        attn = _ring_attend(q, k, v, kv_valid, axis_name,
                            vma=vma or (axis_name,))
        h = h + drop(keys[2 * i],
                     nn.dense(ap["o"], attn.reshape(B, Tl, D), dtype))
        h = h + drop(keys[2 * i + 1],
                     _mlp(lp["mlp"], nn.layernorm(lp["ln2"], h), dtype))
    return nn.layernorm(p["ln_out"], h)


def _mlp(p, x, dtype=None):
    return nn.dense(p["out"], jax.nn.gelu(nn.dense(p["in"], x, dtype)), dtype)


def ring_encoder_apply(params, x, lengths, heads: int, mesh: Mesh,
                       axis: str = "model", dtype=None,
                       data_axis: str | None = "data",
                       dropout_rng=None, rate: float = 0.0):
    """Sequence-parallel transformer encoder: [B, T, in] with T sharded over
    ``axis`` -> [B, T, tf_dim] (same sharding). Exact equivalence with
    models.transformer.encoder_apply (eval mode) is test-pinned.

    T must divide evenly by the axis size (pad T to a bucket first — the
    pipeline's bucketed shapes already guarantee this). When the mesh also
    carries ``data_axis``, the batch dim shards over it, so DP x SP composes
    in one shard_map (the training layout under cfg.mesh.sequence_parallel).

    Training dropout: per-shard keys are derived by folding the shard index
    into ``dropout_rng`` — statistically independent masks per time block,
    NOT bit-identical to the unsharded encoder's masks (eval is exact).
    """
    n = mesh.shape[axis]
    B, T, _ = x.shape
    assert T % n == 0, f"T={T} not divisible by {axis} size {n}"
    # shard the batch over the data axis too (DP x SP) when it divides;
    # otherwise the batch replicates over it (standalone/odd-batch use)
    da = data_axis if (data_axis and mesh.shape.get(data_axis, 1) > 1
                       and B % mesh.shape[data_axis] == 0) else None

    train = dropout_rng is not None and rate > 0.0

    def fn(p, xb, ln, *rng_args):
        rng = None
        if train:
            rng = jax.random.fold_in(rng_args[0], jax.lax.axis_index(axis))
            if da is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(da))
        return _encoder_block_local(p, xb, ln, rng, heads=heads,
                                    t_local=T // n, axis_name=axis,
                                    dtype=dtype, rate=rate,
                                    vma=(da, axis) if da else (axis,))

    in_specs = [P(), P(da, axis, None), P(da)]
    args = [params, x, lengths]
    if train:
        in_specs.append(P())
        args.append(dropout_rng)
    shmap = jax.shard_map(
        fn, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(da, axis, None),
    )
    return shmap(*args)
