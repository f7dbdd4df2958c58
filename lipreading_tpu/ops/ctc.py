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
