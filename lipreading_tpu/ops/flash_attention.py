"""Flash attention (Pallas) for the transformer encoder's self-attention.

Motivation (CLAUDE.md round-2 follow-up; SURVEY.md §6 long-context row): the
unsharded encoder materializes [B, H, T, T] score matrices — fine at the
bucketed T<=128 the corpus uses today, quadratic HBM traffic when clips
lengthen. This kernel streams k/v blocks through VMEM with the standard
online-softmax (running max / denominator / numerator) accumulator, so the
full score matrix never exists: memory is O(T * Dh) and the matmuls stay on
the MXU.

Semantics match models.transformer.mha with a key-validity length mask
exactly (fp32 softmax, -1e30 masking, invalid query rows degrade to uniform
attention the same way) — parity is test-pinned against the einsum path.

Precision (measured on v5e): the kernel's dot_generals follow
jax.default_matmul_precision like the einsum path does. At the MXU default
(bf16 inputs, fp32 accumulation) the two differently-blocked reductions
agree to ~2e-3 on fp32 inputs — under
``jax.default_matmul_precision('highest')`` they agree to 4e-7, and at the
production bf16 activation dtype to one bf16 ulp (7.8e-3). CPU (CI) is
exact either way.

Autodiff: forward runs the Pallas kernel; the backward pass recomputes
attention with the XLA einsum formulation (rematerialization — nothing is
saved but q/k/v), so training through it is exact while the forward memory
win is kept. A fused Pallas backward is a further step if encoder training
at very long T ever dominates.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  heads: int, scale: float):
    """One grid program: one (batch*head, q-block) pair.

    q_ref: [1, Bq, D]; k_ref/v_ref: [1, T, D]; o_ref: [1, Bq, D].
    len_ref: scalar-prefetch [B] valid key lengths.
    """
    bh = pl.program_id(0)
    length = len_ref[bh // heads]
    Bq, D = q_ref.shape[1], q_ref.shape[2]
    T = k_ref.shape[1]
    nk = T // block_k

    q = q_ref[0].astype(jnp.float32)                       # [Bq, D]

    def body(j, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                          # [Bq, Bk]
        kpos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (Bq, block_k), 1
        )
        s = jnp.where(kpos < length, s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m0 = jnp.full((Bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Bq, 1), jnp.float32)
    acc0 = jnp.zeros((Bq, D), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, lengths, block_q: int, block_k: int,
                    interpret: bool | None):
    """q/k/v: [B, T, H, Dh]; lengths: [B]. Returns [B, T, H, Dh]."""
    B, T, H, Dh = q.shape
    scale = 1.0 / math.sqrt(Dh)
    if interpret is None:
        interpret = _interpret()

    # pad the head dim to the 128-lane tile (zero q/k columns leave scores
    # unchanged; zero v columns are sliced off) and T to the block size
    # (padded keys are masked off by `lengths`; padded q rows are sliced)
    Dp = max(128, -(-Dh // 128) * 128)
    bq = min(block_q, max(8, -(-T // 8) * 8))
    Tp = -(-T // max(bq, block_k)) * max(bq, block_k)
    Tp = -(-Tp // bq) * bq
    Tp = -(-Tp // block_k) * block_k

    def prep(x):
        x = jnp.moveaxis(x, 2, 1).reshape(B * H, T, Dh)    # [BH, T, Dh]
        return jnp.pad(x, ((0, 0), (0, Tp - T), (0, Dp - Dh)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, Tp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, Dp), lambda bh, qi, *_: (bh, qi, 0)),
            pl.BlockSpec((1, Tp, Dp), lambda bh, qi, *_: (bh, 0, 0)),
            pl.BlockSpec((1, Tp, Dp), lambda bh, qi, *_: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, Dp), lambda bh, qi, *_: (bh, qi, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, heads=H,
                          scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, Dp), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qf, kf, vf)
    out = out[:, :T, :Dh].reshape(B, H, T, Dh)
    return jnp.moveaxis(out, 1, 2)                         # [B, T, H, Dh]


def _reference_attend(q, k, v, lengths):
    """XLA einsum formulation with identical semantics (used for backward)."""
    B, T, H, Dh = q.shape
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Dh)
    valid = jnp.arange(T)[None, :] < lengths[:, None]      # [B, T]
    s = jnp.where(valid[:, None, None, :], s.astype(jnp.float32), NEG_INF)
    w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, lengths, block_q: int = 128, block_k: int = 128,
                    interpret: bool | None = None):
    """Length-masked non-causal multi-head attention, O(T·Dh) memory.

    q, k, v: [B, T, H, Dh]; lengths: [B] valid key counts. Returns
    [B, T, H, Dh] in q's dtype. Drop-in for the encoder's mha core.
    """
    return _flash_fwd_impl(q, k, v, lengths, block_q, block_k, interpret)


def _flash_fwd(q, k, v, lengths, block_q, block_k, interpret):
    out = _flash_fwd_impl(q, k, v, lengths, block_q, block_k, interpret)
    return out, (q, k, v, lengths)


def _flash_bwd(block_q, block_k, interpret, res, g):
    q, k, v, lengths = res
    _, vjp = jax.vjp(_reference_attend, q, k, v, lengths)
    dq, dk, dv, _ = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)
