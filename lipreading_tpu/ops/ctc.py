"""CTC loss on device (forward algorithm under lax.scan).

The reference uses torch.nn.CTCLoss (C++/CUDA; SURVEY.md §3 "CTC head +
loss"). TPU-native version: the alpha recursion runs as one lax.scan over
time with the (batch x extended-label) lattice vectorized per step — static
shapes, log-space arithmetic, autodiff-able (XLA differentiates the scan; at
T<=128, L<=40 the residuals are tiny). Variable lengths are handled by
carrying alpha unchanged past each sample's input length and by gathering the
terminal lattice positions per label length.

Validated against torch.nn.CTCLoss on CPU in tests/test_ctc.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def extend_labels(labels: jnp.ndarray, blank: int = 0) -> jnp.ndarray:
    """[B, L] labels -> [B, 2L+1] blank-interleaved extended sequence."""
    B, L = labels.shape
    ext = jnp.full((B, 2 * L + 1), blank, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-sample negative log-likelihood, shape [B].

    logits: [B, T, V] unnormalized; labels: [B, L] int32 (no blanks, padded
    arbitrarily past label_lengths); input_lengths/label_lengths: [B].
    """
    B, T, V = logits.shape
    L = labels.shape[1]
    S = 2 * L + 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    ext = extend_labels(labels.astype(jnp.int32), blank)            # [B, S]
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :S]
    skip_ok = (ext != blank) & (ext != ext_prev2)                   # [B, S]

    # lattice emission scores per step: lp_ext[t] = logp[:, t, ext]
    lp_ext = jnp.take_along_axis(
        logp, ext[:, None, :].astype(jnp.int32), axis=2
    )                                                               # [B, T, S]
    lp_ext = jnp.moveaxis(lp_ext, 1, 0)                             # [T, B, S]

    alpha0 = jnp.full((B, S), NEG_INF, dtype=jnp.float32)
    alpha0 = alpha0.at[:, 0].set(lp_ext[0, :, 0])
    if S > 1:
        alpha0 = alpha0.at[:, 1].set(lp_ext[0, :, 1])

    def shift(x, n):
        return jnp.pad(x, ((0, 0), (n, 0)), constant_values=NEG_INF)[:, :S]

    def step(alpha, xs):
        lp_t, t = xs
        a1 = shift(alpha, 1)
        a2 = shift(alpha, 2)
        m = jnp.logaddexp(alpha, a1)
        m = jnp.where(skip_ok, jnp.logaddexp(m, a2), m)
        new = m + lp_t
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, T)
    alpha, _ = jax.lax.scan(step, alpha0, (lp_ext[1:], ts))

    last = jnp.clip(2 * label_lengths.astype(jnp.int32), 0, S - 1)  # [B]
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    prev = jnp.clip(last - 1, 0, S - 1)
    a_prev = jnp.take_along_axis(alpha, prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
    ll = jnp.logaddexp(a_last, a_prev)
    return -ll


def ctc_loss_mean(logits, labels, input_lengths, label_lengths, blank: int = 0):
    """Mean over batch of per-sample NLL normalized by label length
    (torch.nn.CTCLoss(reduction="mean") semantics)."""
    nll = ctc_loss(logits, labels, input_lengths, label_lengths, blank)
    denom = jnp.maximum(label_lengths.astype(jnp.float32), 1.0)
    return jnp.mean(nll / denom)


def ctc_loss_best(logits, labels, input_lengths, label_lengths, blank: int = 0):
    """Backend dispatch: Pallas lattice kernels on TPU, lax.scan elsewhere.

    Both paths are numerically validated against each other and against
    torch.nn.CTCLoss (tests/test_ctc.py, tests/test_ctc_pallas.py).
    """
    import jax

    if jax.default_backend() == "tpu":
        from lipreading_tpu.ops.ctc_pallas import ctc_loss_pallas

        return ctc_loss_pallas(logits, labels, input_lengths, label_lengths,
                               blank)
    return ctc_loss(logits, labels, input_lengths, label_lengths, blank)


def ctc_viterbi_align(
    logp: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Viterbi (max-product) forced alignment through the CTC lattice.

    The best monotone frame<->label attribution of ``labels`` under the
    posteriors — what the streaming transcriber needs to cut a BEAM
    hypothesis at frame boundaries (greedy argmax attributes only its own
    best-path text). One lax.scan forward with per-step backpointers, one
    reverse scan to read the state sequence back.

    logp: [B, T, V] LOG-posteriors; labels: [B, L] bare char ids;
    input_lengths/label_lengths: [B]. Returns [B, T] int32 per-frame emitted
    ids (blank between/within labels, the aligned label elsewhere);
    frames >= input_length emit blank. Collapsing the row reproduces
    labels[:label_length] exactly (infeasible alignments saturate to the
    closest feasible prefix — callers should ensure T >= needed frames).
    """
    B, T, V = logp.shape
    L = labels.shape[1]
    S = 2 * L + 1
    logp = logp.astype(jnp.float32)

    ext = extend_labels(labels.astype(jnp.int32), blank)            # [B, S]
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :S]
    skip_ok = (ext != blank) & (ext != ext_prev2)

    lp_ext = jnp.take_along_axis(logp, ext[:, None, :], axis=2)     # [B, T, S]
    lp_ext = jnp.moveaxis(lp_ext, 1, 0)                             # [T, B, S]

    # states past the usable lattice (beyond 2*label_length) must stay dead
    s_idx = jnp.arange(S)[None, :]
    usable = s_idx <= 2 * label_lengths[:, None]
    dead = jnp.where(usable, 0.0, NEG_INF)

    alpha0 = jnp.full((B, S), NEG_INF, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(lp_ext[0, :, 0])
    if S > 1:
        alpha0 = alpha0.at[:, 1].set(lp_ext[0, :, 1])
    alpha0 = alpha0 + dead

    def shift(x, n):
        return jnp.pad(x, ((0, 0), (n, 0)), constant_values=NEG_INF)[:, :S]

    def step(alpha, xs):
        lp_t, t = xs
        a1 = shift(alpha, 1)
        a2 = jnp.where(skip_ok, shift(alpha, 2), NEG_INF)
        choice = jnp.zeros((B, S), jnp.int32)
        best = alpha
        better = a1 > best
        best = jnp.where(better, a1, best)
        choice = jnp.where(better, 1, choice)
        better = a2 > best
        best = jnp.where(better, a2, best)
        choice = jnp.where(better, 2, choice)
        new = best + lp_t + dead
        active = (t < input_lengths)[:, None]
        return (jnp.where(active, new, alpha),
                jnp.where(active, choice, 0))

    ts = jnp.arange(1, T)
    alpha, choices = jax.lax.scan(step, alpha0, (lp_ext[1:], ts))   # [T-1,B,S]

    last = jnp.clip(2 * label_lengths.astype(jnp.int32), 0, S - 1)
    prev = jnp.clip(last - 1, 0, S - 1)
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(alpha, prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
    s_end = jnp.where(a_last >= a_prev, last, prev)                 # [B]

    def back(s, xs):
        choice_t, t = xs
        c = jnp.take_along_axis(choice_t, s[:, None], axis=1)[:, 0]
        active = t < input_lengths
        s_prev = jnp.where(active, s - c, s)
        return s_prev, s                                            # s at t

    s0, s_seq = jax.lax.scan(back, s_end, (choices, ts), reverse=True)
    states = jnp.concatenate([s0[None], s_seq], axis=0)             # [T, B]
    emit = jnp.take_along_axis(ext, states.T, axis=1)               # [B, T]
    valid = jnp.arange(T)[None, :] < input_lengths[:, None]
    return jnp.where(valid, emit, blank).astype(jnp.int32)
