"""CTC loss as Pallas TPU kernels (BASELINE.json:5: "Pallas CTC-loss ...
kernels").

Structure: the embarrassingly-parallel parts (log_softmax, extended-label
gather) stay in XLA where they fuse; the *serial* lattice recursions — the
part XLA can only express as scan overhead — run inside Pallas:

* forward kernel: one grid program per batch sample; the alpha lattice
  [T, S] lives in VMEM, each step is a shifted-logaddexp over the S lanes
  (VPU), rows are stored for the backward pass; emits per-sample NLL.
* backward kernel: beta recursion in reverse plus the posterior
  gamma = exp(alpha + beta - logZ), emitting d(loss)/d(lp_ext) directly.

A jax.custom_vjp stitches the two under autodiff, so
``ctc_loss_pallas(logits, ...)`` is a drop-in for ops.ctc.ctc_loss (the
lax.scan reference implementation it is tested against, which itself is
validated against torch.nn.CTCLoss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lipreading_tpu.ops.ctc import NEG_INF, extend_labels


def _shift_right(x, n, fill):
    """[1, S] shift along lanes: out[s] = x[s-n], fill for s < n."""
    S = x.shape[-1]
    rolled = pltpu.roll(x, shift=n, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    return jnp.where(idx >= n, rolled, fill)


def _shift_left(x, n, fill):
    """[1, S]: out[s] = x[s+n], fill for s >= S-n."""
    S = x.shape[-1]
    rolled = pltpu.roll(x, shift=S - n, axis=1)   # roll requires shift >= 0
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    return jnp.where(idx < S - n, rolled, fill)


def _fwd_body(lp_ref, skip_ref, inlen, lablen, alpha_ref, nll_ref):
    """lp_ref/alpha_ref: [T, S] refs; skip_ref: [1, S]; nll_ref: [1, 1]."""
    T, S = lp_ref.shape
    skip = skip_ref[:]                                     # [1, S] f32 0/1
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)

    init = jnp.where(
        idx <= jnp.minimum(1, 2 * lablen), lp_ref[pl.ds(0, 1), :], NEG_INF
    )
    alpha_ref[pl.ds(0, 1), :] = init

    def body(t, carry):
        a = carry
        a1 = _shift_right(a, 1, NEG_INF)
        a2 = _shift_right(a, 2, NEG_INF)
        m = jnp.logaddexp(a, a1)
        m = jnp.where(skip > 0.5, jnp.logaddexp(m, a2), m)
        new = m + lp_ref[pl.ds(t, 1), :]
        new = jnp.where(t < inlen, new, a)
        alpha_ref[pl.ds(t, 1), :] = new
        return new

    final = jax.lax.fori_loop(1, T, body, init)

    last = 2 * lablen
    fin_mask = (idx == last) | ((idx == last - 1) & (lablen > 0))
    sel = jnp.where(fin_mask, final, NEG_INF)
    mx = jnp.max(sel)
    ll = mx + jnp.log(jnp.sum(jnp.exp(sel - mx)))
    # scalar result broadcast over a full 128-lane row (mosaic block rules)
    nll_ref[pl.ds(0, 1), :] = jnp.full((1, nll_ref.shape[1]), -ll, jnp.float32)


def _bwd_body(lp_ref, skip_ref, inlen, lablen, alpha_ref, nll, g, grad_ref):
    T, S = lp_ref.shape
    skip = skip_ref[:]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)

    last = 2 * lablen
    terminal = jnp.where(
        (idx == last) | ((idx == last - 1) & (lablen > 0)), 0.0, NEG_INF
    )
    skip_l2 = _shift_left(skip, 2, 0.0)                    # skip_ok[s+2]
    neg_row = jnp.full((1, S), NEG_INF, jnp.float32)

    def body(j, carry):
        t = T - 1 - j
        beta_next = carry
        t_next = jnp.minimum(t + 1, T - 1)
        bn = beta_next + lp_ref[pl.ds(t_next, 1), :]
        b1 = _shift_left(bn, 1, NEG_INF)
        b2 = jnp.where(skip_l2 > 0.5, _shift_left(bn, 2, NEG_INF), NEG_INF)
        rec = jnp.logaddexp(bn, jnp.logaddexp(b1, b2))
        beta = jnp.where(
            t == inlen - 1,
            terminal,
            jnp.where(t >= inlen, neg_row, rec),
        )
        gamma = jnp.exp(alpha_ref[pl.ds(t, 1), :] + beta + nll)
        grad_ref[pl.ds(t, 1), :] = jnp.where(t < inlen, -gamma * g, 0.0)
        return beta

    jax.lax.fori_loop(0, T, body, neg_row)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.custom_vjp
def _ctc_lattice(lp_ext, skip_ok, input_lengths, label_lengths):
    nll, _ = _ctc_lattice_fwd_impl(lp_ext, skip_ok, input_lengths, label_lengths)
    return nll


def _ctc_lattice_fwd_impl(lp_ext, skip_ok, input_lengths, label_lengths):
    B, T, S = lp_ext.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,     # input_lengths, label_lengths
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, S), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, S), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda b, *_: (b, 0, 0)),
        ],
    )

    def kernel(inlen_ref, lablen_ref, lp_ref, skip_ref, alpha_ref, nll_ref):
        b = pl.program_id(0)
        _fwd_body(
            lp_ref.at[0], skip_ref.at[0],
            inlen_ref[b], lablen_ref[b],
            alpha_ref.at[0], nll_ref.at[0],
        )

    alpha, nll = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, S), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(input_lengths.astype(jnp.int32), label_lengths.astype(jnp.int32),
      lp_ext.astype(jnp.float32), skip_ok[:, None, :].astype(jnp.float32))
    return nll[:, 0, 0], alpha


def _ctc_lattice_fwd(lp_ext, skip_ok, input_lengths, label_lengths):
    nll, alpha = _ctc_lattice_fwd_impl(lp_ext, skip_ok, input_lengths,
                                       label_lengths)
    return nll, (lp_ext, skip_ok, input_lengths, label_lengths, alpha, nll)


def _ctc_lattice_bwd(res, g):
    lp_ext, skip_ok, input_lengths, label_lengths, alpha, nll = res
    B, T, S = lp_ext.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, S), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, T, S), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, S), lambda b, *_: (b, 0, 0)),
    )

    def kernel(inlen_ref, lablen_ref, lp_ref, skip_ref, alpha_ref, nll_ref,
               g_ref, grad_ref):
        b = pl.program_id(0)
        _bwd_body(
            lp_ref.at[0], skip_ref.at[0],
            inlen_ref[b], lablen_ref[b],
            alpha_ref.at[0], nll_ref[0, 0, 0], g_ref[0, 0, 0], grad_ref.at[0],
        )

    grad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, S), jnp.float32),
        interpret=_interpret(),
    )(input_lengths.astype(jnp.int32), label_lengths.astype(jnp.int32),
      lp_ext.astype(jnp.float32), skip_ok[:, None, :].astype(jnp.float32),
      alpha,
      jnp.broadcast_to(nll[:, None, None], (B, 1, 128)).astype(jnp.float32),
      jnp.broadcast_to(g[:, None, None], (B, 1, 128)).astype(jnp.float32))
    return grad, None, None, None


_ctc_lattice.defvjp(_ctc_lattice_fwd, _ctc_lattice_bwd)


def ctc_loss_pallas(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Drop-in for ops.ctc.ctc_loss with the recursion in Pallas. [B] NLL."""
    B, T, V = logits.shape
    L = labels.shape[1]
    S = 2 * L + 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ext = extend_labels(labels.astype(jnp.int32), blank)
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :S]
    skip_ok = (ext != blank) & (ext != ext_prev2)
    lp_ext = jnp.take_along_axis(
        logp, ext[:, None, :].astype(jnp.int32), axis=2
    )                                                      # [B, T, S]
    # pad the lattice dim to the 128-lane tile; padded positions carry -inf
    # emissions and no skip transitions, so they are unreachable (and their
    # gradients are exactly zero). jnp.pad is differentiable, so autodiff
    # slices the padded gradient back down automatically.
    S_pad = -(-S // 128) * 128
    if S_pad != S:
        lp_ext = jnp.pad(lp_ext, ((0, 0), (0, 0), (0, S_pad - S)),
                         constant_values=NEG_INF)
        skip_ok = jnp.pad(skip_ok, ((0, 0), (0, S_pad - S)))
    return _ctc_lattice(lp_ext, skip_ok, input_lengths, label_lengths)
