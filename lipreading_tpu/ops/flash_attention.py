"""Flash attention (Pallas) for the transformer encoder's self-attention.

Motivation (CLAUDE.md round-2 follow-up; SURVEY.md §6 long-context row): the
unsharded encoder materializes [B, H, T, T] score matrices — fine at the
bucketed T<=128 the corpus uses today, quadratic HBM traffic when clips
lengthen. This kernel streams k/v blocks through VMEM with the standard
online-softmax (running max / denominator / numerator) accumulator, so the
full score matrix never exists: memory is O(T * Dh) and the matmuls stay on
the MXU.

Semantics match models.transformer.mha with a key-validity length mask
exactly (fp32 softmax, -1e30 masking; a fully-masked sample — length==0 —
emits exact zeros in both the kernel and the einsum reference, rather than
a padding-dependent uniform average) — parity is test-pinned against the
einsum path.

Precision (measured on v5e): the kernel's dot_generals follow
jax.default_matmul_precision like the einsum path does. At the MXU default
(bf16 inputs, fp32 accumulation) the two differently-blocked reductions
agree to ~2e-3 on fp32 inputs — under
``jax.default_matmul_precision('highest')`` they agree to 4e-7, and at the
production bf16 activation dtype to one bf16 ulp (7.8e-3). CPU (CI) is
exact either way.

Autodiff: forward runs the Pallas kernel and additionally emits the per-row
logsumexp. TWO backward implementations exist, selected by ``bwd``:

* ``"xla"`` — recompute attention with the einsum formulation and jax.vjp
  through it (rematerialization: nothing saved but q/k/v). The [T, T]
  score matrix exists transiently in the backward. Fastest on v5e
  wherever it fits (T=1024 fwd+bwd: ~2.7 ms).
* ``"pallas"`` — the standard flash backward: two kernels (dq; dk/dv)
  rematerialize probabilities blockwise from (q, k, lse), so NO [T, T]
  buffer exists in training either. It is the same order as einsum where
  einsum fits (T=1024 fwd+bwd: ~4-7 ms vs ~3 ms; block size dominates —
  128 blocks are ~20x slower, pure grid-step overhead), and it is the
  ONLY option once B·H·T² grad buffers blow HBM (einsum fails to compile
  at T=16384, B=2, H=8).
* ``"fused"`` — single-sweep variant of "pallas": dq is computed in the
  same (k, q) block visit as dk/dv (5 matmuls per block pair instead of
  the two-pass 7, and one grid instead of two), accumulated in a
  full-length [Tp, D] fp32 VMEM scratch. The scratch caps T (~16k at
  D=128); above the cap it silently falls back to the two-pass pair.
* ``"auto"`` (default) — "xla" below T=2048, "fused" at/above (falling
  back to the two-pass pair past the scratch cap).

Long-T block/bwd sweep on v5e (scripts/bench_flash.py, B=2 H=8 Dh=64,
fwd+bwd ms): T=8192: 256/pallas 65, 256/fused 57, 512/pallas 43,
512/fused 37; T=16384: 208 / 172 / 103 / 89. Hence the defaults:
block 512 (clamped to T for short clips) + fused backward under auto —
2.3x the round-2 shipped configuration (256/pallas) at T=16384.

Parity vs jax.vjp of the einsum formulation is test-pinned for all three
(values and all three gradients; CPU exact, TPU rel ~4e-5 at highest).
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


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                  m_sc, l_sc, acc_sc, *, heads: int, scale: float):
    """One grid program: one (batch*head, q-block, k-block) step.

    The k axis lives in the GRID, so k/v stream through VMEM one
    [1, Bk, D] block at a time (the pipeline double-buffers them) and the
    online-softmax state rides in VMEM scratch across the k steps — VMEM
    use is O(block) regardless of T, unlike the earlier full-length-k/v
    version which hit the VMEM cap near T=8192.

    q_ref/o_ref: [1, Bq, D] (revisited across k steps; written at the
    last). len_ref: scalar-prefetch [B] valid key lengths. lse_ref
    (training forward only): [1, Bq, 128] logsumexp, lane-broadcast.
    """
    bh, kj = pl.program_id(0), pl.program_id(2)
    nk = pl.num_programs(2)
    length = len_ref[bh // heads]
    Bq, D = q_ref.shape[1], q_ref.shape[2]
    Bk = k_ref.shape[1]

    @pl.when(kj == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q = q_ref[0].astype(jnp.float32)                       # [Bq, D]
    k_blk = k_ref[0].astype(jnp.float32)                   # [Bk, D]
    v_blk = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                              # [Bq, Bk]
    kpos = kj * Bk + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 1)
    s = jnp.where(kpos < length, s, NEG_INF)
    m = m_sc[:, :1]                                        # [Bq, 1]
    m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l = l_sc[:, :1] * corr + p.sum(axis=-1, keepdims=True)
    acc_sc[:] = acc_sc[:] * corr + jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
    l_sc[:] = jnp.broadcast_to(l, l_sc.shape)

    @pl.when(kj == nk - 1)
    def _():
        l_fin = l_sc[:, :1]
        o = acc_sc[:] / jnp.maximum(l_fin, 1e-30)
        # a fully-masked sample (length==0) would otherwise degrade to a
        # uniform average over the PADDED Tp keys (off by T/Tp from the
        # reference's T-key average) — emit exact zeros in both paths instead
        o = jnp.where(length > 0, o, 0.0)
        o_ref[0] = o.astype(o_ref.dtype)
        if lse_ref is not None:
            lse = m_sc[:, :1] + jnp.log(jnp.maximum(l_fin, 1e-30))
            lse_ref[0] = jnp.broadcast_to(lse, (Bq, lse_ref.shape[2]))


def _pad_geometry(T: int, Dh: int, block_q: int, block_k: int):
    """Clamp BOTH block sizes to the (8-aligned) sequence before rounding
    Tp, so a short encoder sequence (T=64) is not padded out to a large
    default block (512) and burned as masked work."""
    Dp = max(128, -(-Dh // 128) * 128)
    t8 = max(8, -(-T // 8) * 8)
    bq = min(block_q, t8)
    bk = min(block_k, t8)
    Tp = -(-T // max(bq, bk)) * max(bq, bk)
    Tp = -(-Tp // bq) * bq
    Tp = -(-Tp // bk) * bk
    return Dp, bq, bk, Tp


def _prep(x, Tp, Dp):
    """[B, T, H, Dh] -> zero-padded [B*H, Tp, Dp]."""
    B, T, H, Dh = x.shape
    x = jnp.moveaxis(x, 2, 1).reshape(B * H, T, Dh)
    return jnp.pad(x, ((0, 0), (0, Tp - T), (0, Dp - Dh)))


def _unprep(x, B, T, H, Dh):
    """[B*H, Tp, Dp] -> [B, T, H, Dh]."""
    return jnp.moveaxis(x[:, :T, :Dh].reshape(B, H, T, Dh), 1, 2)


def _sds(shape, dtype, like):
    """ShapeDtypeStruct carrying ``like``'s varying-mesh-axes set, so the
    kernels trace inside shard_map (e.g. the pipeline-parallel stages)
    under check_vma as well as under plain GSPMD."""
    return jax.ShapeDtypeStruct(shape, dtype, vma=jax.typeof(like).vma)


def _flash_fwd_impl(q, k, v, lengths, block_q: int, block_k: int,
                    interpret: bool | None, return_lse: bool = False):
    """q/k/v: [B, T, H, Dh]; lengths: [B]. Returns [B, T, H, Dh]
    (+ lse [B*H, Tp] when return_lse — the training forward)."""
    B, T, H, Dh = q.shape
    scale = 1.0 / math.sqrt(Dh)
    if interpret is None:
        interpret = _interpret()

    # pad the head dim to the 128-lane tile (zero q/k columns leave scores
    # unchanged; zero v columns are sliced off) and T to the block size
    # (padded keys are masked off by `lengths`; padded q rows are sliced)
    Dp, bq, bk, Tp = _pad_geometry(T, Dh, block_q, block_k)
    qf, kf, vf = _prep(q, Tp, Dp), _prep(k, Tp, Dp), _prep(v, Tp, Dp)

    qblk = lambda bh, qi, kj, *_: (bh, qi, 0)
    kblk = lambda bh, qi, kj, *_: (bh, kj, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, Tp // bq, Tp // bk),
        in_specs=[
            pl.BlockSpec((1, bq, Dp), qblk),
            pl.BlockSpec((1, bk, Dp), kblk),
            pl.BlockSpec((1, bk, Dp), kblk),
        ],
        out_specs=[pl.BlockSpec((1, bq, Dp), qblk)] + (
            [pl.BlockSpec((1, bq, 128), qblk)] if return_lse else []
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),    # running max
            pltpu.VMEM((bq, 128), jnp.float32),    # running denominator
            pltpu.VMEM((bq, Dp), jnp.float32),     # output accumulator
        ],
    )
    out_shape = [_sds((B * H, Tp, Dp), q.dtype, qf)] + (
        [_sds((B * H, Tp, 128), jnp.float32, qf)]
        if return_lse else []
    )
    if return_lse:
        kern = functools.partial(_flash_kernel, heads=H, scale=scale)
    else:
        # separate arity (no lse_ref) so the inference forward writes no
        # extra HBM
        kern = functools.partial(
            lambda lr, qr, kr, vr, orf, m, l, a, **kw: _flash_kernel(
                lr, qr, kr, vr, orf, None, m, l, a, **kw
            ), heads=H, scale=scale,
        )
    res = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(lengths.astype(jnp.int32), qf, kf, vf)
    out = _unprep(res[0], B, T, H, Dh)
    if return_lse:
        return out, res[1][:, :, 0]                        # [BH, Tp]
    return out


def _bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, dd_ref, lse_ref,
                   dq_ref, acc_sc, *, heads: int, scale: float):
    """dq over grid (batch*head, q-block, k-block):
    dq = sum_j (p_j*(dp_j - D)) @ k_j — k/v stream per grid step, the
    accumulator rides VMEM scratch, dq written at the last k step.

    q/do/dq: [1, Bq, D]; k/v: [1, Bk, D]; dd_ref/lse_ref: [1, Bq, 128]
    (per-row delta = rowsum(dO*O) and logsumexp, broadcast over lanes)."""
    bh, kj = pl.program_id(0), pl.program_id(2)
    nk = pl.num_programs(2)
    length = len_ref[bh // heads]
    Bq = q_ref.shape[1]
    Bk = k_ref.shape[1]

    @pl.when(kj == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]                                # [Bq, 1]
    delta = dd_ref[0][:, :1]                               # [Bq, 1]
    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    kpos = kj * Bk + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 1)
    s = jnp.where(kpos < length, s, NEG_INF)
    p = jnp.exp(s - lse)                                   # [Bq, Bk]
    dp = jax.lax.dot_general(
        do, v_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    acc_sc[:] = acc_sc[:] + jax.lax.dot_general(
        ds, k_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kj == nk - 1)
    def _():
        dq_ref[0] = (acc_sc[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(len_ref, q_ref, do_ref, dd_ref, lse_ref, k_ref, v_ref,
                    dk_ref, dv_ref, dk_sc, dv_sc, *, heads: int,
                    scale: float):
    """dk/dv over grid (batch*head, k-block, q-block):
    dv = sum_i p_i^T @ dO_i;  dk = sum_i (p_i*(dp_i - D_i))^T @ q_i —
    q/do/delta/lse stream per grid step, accumulators ride VMEM scratch.

    k/v/dk/dv: [1, Bk, D]; q/do: [1, Bq, D]; dd/lse: [1, Bq, 128]."""
    bh, kj, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)
    length = len_ref[bh // heads]
    Bk = k_ref.shape[1]

    @pl.when(qi == 0)
    def _():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    kpos = kj * Bk + jax.lax.broadcasted_iota(jnp.int32, (1, Bk), 1)
    kvalid = kpos < length                                 # [1, Bk]
    q_blk = q_ref[0].astype(jnp.float32)
    do_blk = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]                                # [Bq, 1]
    delta = dd_ref[0][:, :1]
    s = jax.lax.dot_general(
        q_blk, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                              # [Bq, Bk]
    s = jnp.where(kvalid, s, NEG_INF)
    p = jnp.exp(s - lse)
    dv_sc[:] = dv_sc[:] + jax.lax.dot_general(
        p, do_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [Bk, D]
    dp = jax.lax.dot_general(
        do_blk, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dk_sc[:] = dk_sc[:] + jax.lax.dot_general(
        ds, q_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = (dk_sc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(len_ref, q_ref, do_ref, dd_ref, lse_ref, k_ref, v_ref,
                      dq_ref, dk_ref, dv_ref, dq_sc, dk_sc, dv_sc, *,
                      heads: int, scale: float):
    """Single-sweep backward (VERDICT r2 #9): dq fused into the dk/dv pass.

    Grid (batch*head, k-block, q-block) — one visit per (k, q) block pair
    computes ALL of dv/dk/dq from one s/p rematerialization (5 matmuls vs
    the two-pass kernels' 7: s and dp are no longer recomputed in a second
    sweep, and the grid runs once instead of twice).

    dk/dv accumulate in per-block VMEM scratch across the q steps (written
    at qi == nq-1, exactly like _bwd_dkv_kernel). dq needs the transposed
    accumulation — across the OUTER k axis — so it rides a full-length
    [Tp, D] fp32 scratch, sliced per q-block: initialized on the kj == 0
    sweep, accumulated on later sweeps, written out on the last (this also
    re-initializes naturally when bh advances). The scratch is what caps
    this kernel's T (~16k at D=128 in 16 MB VMEM); _flash_bwd_impl falls
    back to the two-pass pair above the cap.

    k/v/dk/dv: [1, Bk, D]; q/do/dq: [1, Bq, D]; dd/lse: [1, Bq, 128]
    (per-row delta = rowsum(dO*O) and logsumexp, lane-broadcast)."""
    bh, kj, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nq, nk = pl.num_programs(2), pl.num_programs(1)
    length = len_ref[bh // heads]
    Bq = q_ref.shape[1]
    Bk = k_ref.shape[1]

    @pl.when(qi == 0)
    def _():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    kpos = kj * Bk + jax.lax.broadcasted_iota(jnp.int32, (1, Bk), 1)
    kvalid = kpos < length                                 # [1, Bk]
    q_blk = q_ref[0].astype(jnp.float32)
    do_blk = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]                                # [Bq, 1]
    delta = dd_ref[0][:, :1]
    s = jax.lax.dot_general(
        q_blk, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                              # [Bq, Bk]
    s = jnp.where(kvalid, s, NEG_INF)
    p = jnp.exp(s - lse)
    dv_sc[:] = dv_sc[:] + jax.lax.dot_general(
        p, do_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [Bk, D]
    dp = jax.lax.dot_general(
        do_blk, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)                                  # [Bq, Bk]
    dk_sc[:] = dk_sc[:] + jax.lax.dot_general(
        ds, q_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_row = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [Bq, D]
    rows = pl.ds(qi * Bq, Bq)

    @pl.when(kj == 0)
    def _():
        dq_sc[rows] = dq_row

    @pl.when(kj > 0)
    def _():
        dq_sc[rows] = dq_sc[rows] + dq_row

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = (dk_sc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)

    @pl.when(kj == nk - 1)
    def _():
        dq_ref[0] = (dq_sc[rows] * scale).astype(dq_ref.dtype)


# the fused backward's dq scratch is [Tp, Dp] fp32 — cap it well under the
# ~16 MB/core VMEM so blocks + dk/dv scratch still fit (measured headroom,
# not a hardware constant)
FUSED_DQ_SCRATCH_CAP = 8 * 1024 * 1024


def _flash_bwd_fused_impl(q, k, v, lengths, out, lse, g, block_q: int,
                          block_k: int, interpret: bool | None):
    """Single-sweep blockwise backward (see _bwd_fused_kernel)."""
    B, T, H, Dh = q.shape
    scale = 1.0 / math.sqrt(Dh)
    if interpret is None:
        interpret = _interpret()
    Dp, bq, bk, Tp = _pad_geometry(T, Dh, block_q, block_k)
    qf, kf, vf = _prep(q, Tp, Dp), _prep(k, Tp, Dp), _prep(v, Tp, Dp)
    of, gf = _prep(out, Tp, Dp), _prep(g, Tp, Dp)
    delta = (gf * of).sum(axis=-1)                         # [BH, Tp]
    ddf = jnp.broadcast_to(delta[:, :, None], (B * H, Tp, 128))
    lsef = jnp.broadcast_to(lse[:, :, None], (B * H, Tp, 128))

    kblk = lambda bh, kj, qi, *_: (bh, kj, 0)   # grid: (bh, k, q)
    qblk = lambda bh, kj, qi, *_: (bh, qi, 0)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, heads=H, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, Tp // bk, Tp // bq),
            in_specs=[
                pl.BlockSpec((1, bq, Dp), qblk),    # q (streamed)
                pl.BlockSpec((1, bq, Dp), qblk),    # dO (streamed)
                pl.BlockSpec((1, bq, 128), qblk),   # delta (streamed)
                pl.BlockSpec((1, bq, 128), qblk),   # lse (streamed)
                pl.BlockSpec((1, bk, Dp), kblk),    # k
                pl.BlockSpec((1, bk, Dp), kblk),    # v
            ],
            out_specs=[
                pl.BlockSpec((1, bq, Dp), qblk),
                pl.BlockSpec((1, bk, Dp), kblk),
                pl.BlockSpec((1, bk, Dp), kblk),
            ],
            scratch_shapes=[
                pltpu.VMEM((Tp, Dp), jnp.float32),  # dq accumulator
                pltpu.VMEM((bk, Dp), jnp.float32),  # dk accumulator
                pltpu.VMEM((bk, Dp), jnp.float32),  # dv accumulator
            ],
        ),
        out_shape=[
            _sds((B * H, Tp, Dp), q.dtype, qf),
            _sds((B * H, Tp, Dp), k.dtype, qf),
            _sds((B * H, Tp, Dp), v.dtype, qf),
        ],
        interpret=interpret,
    )(lengths.astype(jnp.int32), qf, gf, ddf, lsef, kf, vf)

    return (_unprep(dq, B, T, H, Dh), _unprep(dk, B, T, H, Dh),
            _unprep(dv, B, T, H, Dh))


def _flash_bwd_impl(q, k, v, lengths, out, lse, g, block_q: int,
                    block_k: int, interpret: bool | None):
    """Blockwise backward. lse: [B*H, Tp] from the training forward."""
    B, T, H, Dh = q.shape
    scale = 1.0 / math.sqrt(Dh)
    if interpret is None:
        interpret = _interpret()
    Dp, bq, bk, Tp = _pad_geometry(T, Dh, block_q, block_k)
    qf, kf, vf = _prep(q, Tp, Dp), _prep(k, Tp, Dp), _prep(v, Tp, Dp)
    of, gf = _prep(out, Tp, Dp), _prep(g, Tp, Dp)
    # delta = rowsum(dO * O): cheap elementwise-reduce, XLA fuses it; both
    # it and lse ride as [BH, Tp, 128] lane-broadcast blocks
    delta = (gf * of).sum(axis=-1)                         # [BH, Tp]
    ddf = jnp.broadcast_to(delta[:, :, None], (B * H, Tp, 128))
    lsef = jnp.broadcast_to(lse[:, :, None], (B * H, Tp, 128))

    qblk = lambda bh, qi, kj, *_: (bh, qi, 0)   # dq grid: (bh, q, k)
    kblk = lambda bh, qi, kj, *_: (bh, kj, 0)
    lens = lengths.astype(jnp.int32)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, heads=H, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, Tp // bq, Tp // bk),
            in_specs=[
                pl.BlockSpec((1, bq, Dp), qblk),    # q
                pl.BlockSpec((1, bk, Dp), kblk),    # k (streamed)
                pl.BlockSpec((1, bk, Dp), kblk),    # v (streamed)
                pl.BlockSpec((1, bq, Dp), qblk),    # dO
                pl.BlockSpec((1, bq, 128), qblk),   # delta
                pl.BlockSpec((1, bq, 128), qblk),   # lse
            ],
            out_specs=pl.BlockSpec((1, bq, Dp), qblk),
            scratch_shapes=[pltpu.VMEM((bq, Dp), jnp.float32)],
        ),
        out_shape=_sds((B * H, Tp, Dp), q.dtype, qf),
        interpret=interpret,
    )(lens, qf, kf, vf, gf, ddf, lsef)

    kblk2 = lambda bh, kj, qi, *_: (bh, kj, 0)  # dkv grid: (bh, k, q)
    qblk2 = lambda bh, kj, qi, *_: (bh, qi, 0)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, heads=H, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, Tp // bk, Tp // bq),
            in_specs=[
                pl.BlockSpec((1, bq, Dp), qblk2),   # q (streamed)
                pl.BlockSpec((1, bq, Dp), qblk2),   # dO (streamed)
                pl.BlockSpec((1, bq, 128), qblk2),  # delta (streamed)
                pl.BlockSpec((1, bq, 128), qblk2),  # lse (streamed)
                pl.BlockSpec((1, bk, Dp), kblk2),   # k
                pl.BlockSpec((1, bk, Dp), kblk2),   # v
            ],
            out_specs=[
                pl.BlockSpec((1, bk, Dp), kblk2),
                pl.BlockSpec((1, bk, Dp), kblk2),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, Dp), jnp.float32),
                pltpu.VMEM((bk, Dp), jnp.float32),
            ],
        ),
        out_shape=[
            _sds((B * H, Tp, Dp), k.dtype, qf),
            _sds((B * H, Tp, Dp), v.dtype, qf),
        ],
        interpret=interpret,
    )(lens, qf, gf, ddf, lsef, kf, vf)

    return (_unprep(dq, B, T, H, Dh), _unprep(dk, B, T, H, Dh),
            _unprep(dv, B, T, H, Dh))


def _reference_attend(q, k, v, lengths):
    """XLA einsum formulation with identical semantics (used for backward)."""
    B, T, H, Dh = q.shape
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Dh)
    valid = jnp.arange(T)[None, :] < lengths[:, None]      # [B, T]
    s = jnp.where(valid[:, None, None, :], s.astype(jnp.float32), NEG_INF)
    w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    # zero (not uniform-average) for fully-masked samples — matches the
    # Pallas kernel's length==0 guard, and the vjp through this gate zeroes
    # their gradients too
    return out * (lengths > 0).astype(out.dtype)[:, None, None, None]


PALLAS_BWD_MIN_T = 2048     # auto policy: einsum bwd fits & wins below this


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(q, k, v, lengths, block_q: int = 512, block_k: int = 512,
                    interpret: bool | None = None, bwd: str = "auto"):
    """Length-masked non-causal multi-head attention, O(T·Dh) memory.

    q, k, v: [B, T, H, Dh]; lengths: [B] valid key counts. Returns
    [B, T, H, Dh] in q's dtype. Drop-in for the encoder's mha core.
    ``bwd``: backward implementation — "xla" (einsum remat), "pallas"
    (blockwise, no [T, T] buffer), "auto" (see module docstring).
    """
    return _flash_fwd_impl(q, k, v, lengths, block_q, block_k, interpret)


def _flash_fwd(q, k, v, lengths, block_q, block_k, interpret, bwd):
    use_pallas = bwd in ("pallas", "fused") or (
        bwd == "auto" and q.shape[1] >= PALLAS_BWD_MIN_T
    )
    if use_pallas:
        out, lse = _flash_fwd_impl(q, k, v, lengths, block_q, block_k,
                                   interpret, return_lse=True)
        return out, (q, k, v, lengths, out, lse)
    out = _flash_fwd_impl(q, k, v, lengths, block_q, block_k, interpret)
    return out, (q, k, v, lengths, None, None)


def _flash_bwd(block_q, block_k, interpret, bwd, res, g):
    q, k, v, lengths, out, lse = res
    if lse is not None:
        # fully-masked samples emit zeros in the forward; gating g zeroes
        # their (linear-in-g) dq/dk/dv the same way the einsum vjp does
        g = g * (lengths > 0).astype(g.dtype)[:, None, None, None]
        Dp, _, _, Tp = _pad_geometry(q.shape[1], q.shape[3], block_q, block_k)
        use_fused = (bwd in ("fused", "auto")
                     and Tp * Dp * 4 <= FUSED_DQ_SCRATCH_CAP)
        impl = _flash_bwd_fused_impl if use_fused else _flash_bwd_impl
        dq, dk, dv = impl(q, k, v, lengths, out, lse, g, block_q,
                          block_k, interpret)
        return dq, dk, dv, None
    _, vjp = jax.vjp(_reference_attend, q, k, v, lengths)
    dq, dk, dv, _ = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)
