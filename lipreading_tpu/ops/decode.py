"""Inference decoding on device: greedy CTC collapse + batched beam search.

The reference decodes with Python loops — a per-step beam loop over decoder
calls (SURVEY.md §4.3, "🔥 beam search ... ⇄ ATen per step"). Here decoding is
a single jitted program per utterance batch:

* CTC greedy: argmax -> collapse-repeats -> drop-blanks, vectorized with a
  stable-sort compaction so the result is a padded [B, T] id tensor on device.
* Beam search: lax.scan over steps with the beam dimension folded into the
  batch ([B*W] states), top-k expansion/pruning, finished-beam masking and
  length-normalized final selection — model-agnostic via a step_fn closure
  (works for both the attention-GRU and transformer decoders).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def early_exit_scan(body, carry, finished_of, bufs, max_len: int):
    """Run a scan-like ``body`` under lax.while_loop, stopping once every
    row is finished.

    ``body(carry, None) -> (carry, ys)`` with ys a tuple matching ``bufs``
    (each buf is a prefilled [max_len, ...] array); ``finished_of(carry)``
    -> bool array. The decode loops are latency-bound and typical
    hypotheses finish well before max_len; correctness requires the caller
    to PREFILL bufs with exactly what the skipped steps would have written
    — for the beam searches that is eos tokens + identity backpointers
    (post-finish steps emit eos on every beam with an identity permutation:
    scores already sorted, eos adds 0.0, lax.top_k is stable), for greedy
    just eos. Returns (carry, bufs)."""

    def w_cond(c):
        t, carry, _ = c
        return (t < max_len) & ~finished_of(carry).all()

    def w_body(c):
        t, carry, bufs = c
        carry, ys = body(carry, None)
        bufs = tuple(
            jax.lax.dynamic_update_index_in_dim(b, y, t, 0)
            for b, y in zip(bufs, ys)
        )
        return t + 1, carry, bufs

    _, carry, bufs = jax.lax.while_loop(
        w_cond, w_body, (jnp.int32(0), carry, tuple(bufs))
    )
    return carry, bufs


def ctc_greedy_ids(logits: jnp.ndarray, lengths: jnp.ndarray, blank: int = 0):
    """[B, T, V] logits -> (ids [B, T], out_lengths [B]) collapsed on device.

    ids[b, :out_lengths[b]] is the collapsed label sequence, padded with blank.
    """
    B, T, V = logits.shape
    raw = jnp.argmax(logits, axis=-1)                       # [B, T]
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    prev = jnp.pad(raw, ((0, 0), (1, 0)), constant_values=blank)[:, :T]
    keep = (raw != blank) & (raw != prev) & valid           # [B, T]
    # stable compaction: order kept positions first, preserving time order
    order = jnp.argsort(~keep, axis=1, stable=True)         # kept first
    ids = jnp.take_along_axis(raw, order, axis=1)
    out_len = keep.sum(axis=1)
    ids = jnp.where(jnp.arange(T)[None, :] < out_len[:, None], ids, blank)
    return ids, out_len


def greedy_decode(step_fn, state, batch: int, max_len: int, sos: int, eos: int):
    """Autoregressive argmax decode. Returns (ids [B, max_len], lengths [B])."""

    def body(carry, _):
        state, tok, finished, length = carry
        state, logp = step_fn(state, tok)
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, eos, nxt)
        finished2 = finished | (nxt == eos)
        length = length + (~finished).astype(jnp.int32)
        return (state, nxt, finished2, length), (nxt,)

    tok0 = jnp.full((batch,), sos, jnp.int32)
    fin0 = jnp.zeros((batch,), bool)
    len0 = jnp.zeros((batch,), jnp.int32)
    (_, _, _, lengths), (toks,) = early_exit_scan(
        body, (state, tok0, fin0, len0), lambda c: c[2],
        (jnp.full((max_len, batch), eos, jnp.int32),), max_len,
    )
    ids = jnp.moveaxis(toks, 0, 1)                          # [B, max_len]
    # mask everything after (and including) eos
    pos = jnp.arange(max_len)[None, :]
    ids = jnp.where(pos < lengths[:, None], ids, eos)
    return ids, lengths


def beam_search(
    step_fn,
    init_state,
    batch: int,
    beam: int,
    max_len: int,
    sos: int,
    eos: int,
    length_penalty: float = 0.6,
):
    """Batched beam search. ``init_state`` leaves must already be tiled to
    leading dim B*W (use :func:`tile_for_beams`). Returns (ids [B, max_len],
    lengths [B]) for the best finished beam per sample.

    step_fn: (state[B*W...], tokens [B*W]) -> (state', logp [B*W, V]).
    """
    BW = batch * beam

    def body(carry, _):
        state, scores, toks, finished, lengths = carry
        state, logp = step_fn(state, toks.reshape(BW))
        V = logp.shape[-1]
        logp = jax.nn.log_softmax(logp.astype(jnp.float32), axis=-1)
        logp = logp.reshape(batch, beam, V)
        # finished beams may only emit eos at no cost
        eos_only = jnp.full((V,), NEG_INF).at[eos].set(0.0)
        logp = jnp.where(finished[:, :, None], eos_only[None, None, :], logp)
        total = scores[:, :, None] + logp                   # [B, W, V]
        flat = total.reshape(batch, beam * V)
        new_scores, idx = jax.lax.top_k(flat, beam)         # [B, W]
        src_beam = idx // V                                 # [B, W]
        new_tok = (idx % V).astype(jnp.int32)

        def gather_beam(x):
            xs = x.reshape(batch, beam, *x.shape[1:])
            g = jnp.take_along_axis(
                xs, src_beam.reshape(batch, beam, *([1] * (xs.ndim - 2))), axis=1
            )
            return g.reshape(BW, *x.shape[1:])

        state = jax.tree.map(gather_beam, state)
        finished = jnp.take_along_axis(finished, src_beam, axis=1)
        lengths = jnp.take_along_axis(lengths, src_beam, axis=1)
        lengths = lengths + (~finished).astype(jnp.int32)
        finished = finished | (new_tok == eos)
        return (state, new_scores, new_tok, finished, lengths), (new_tok, src_beam)

    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((beam - 1,), NEG_INF)])[None],
        (batch, 1),
    )
    toks0 = jnp.full((batch, beam), sos, jnp.int32)
    fin0 = jnp.zeros((batch, beam), bool)
    len0 = jnp.zeros((batch, beam), jnp.int32)
    # early-exit buffers: eos tokens + identity backpointers (see
    # early_exit_scan — exactly what the skipped steps would write), so the
    # backtrack/selection below is unchanged
    toks_buf0 = jnp.full((max_len, batch, beam), eos, jnp.int32)
    srcs_buf0 = jnp.tile(
        jnp.arange(beam, dtype=jnp.int32)[None, None], (max_len, batch, 1)
    )
    (state, scores, _, finished, lengths), (toks, srcs) = early_exit_scan(
        body, (init_state, scores0, toks0, fin0, len0), lambda c: c[3],
        (toks_buf0, srcs_buf0), max_len,
    )
    # backtrack: follow src_beam pointers from the final beams to t=0
    def backtrack(carry, xs):
        beam_idx = carry                                    # [B, W]
        tok_t, src_t = xs                                   # [B, W] each
        tok = jnp.take_along_axis(tok_t, beam_idx, axis=1)
        beam_idx = jnp.take_along_axis(src_t, beam_idx, axis=1)
        return beam_idx, tok

    final_idx = jnp.tile(jnp.arange(beam)[None], (batch, 1))
    _, rev_toks = jax.lax.scan(
        backtrack, final_idx, (toks[::-1], srcs[::-1])
    )
    seq = jnp.moveaxis(rev_toks[::-1], 0, 1)                # [B, max_len, W]
    seq = jnp.moveaxis(seq, 2, 1)                           # [B, W, max_len]

    norm = ((lengths.astype(jnp.float32) + 5.0) / 6.0) ** length_penalty
    norm_scores = scores / jnp.maximum(norm, 1e-6)
    best = jnp.argmax(norm_scores, axis=1)                  # [B]
    ids = jnp.take_along_axis(seq, best[:, None, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    pos = jnp.arange(max_len)[None, :]
    ids = jnp.where(pos < best_len[:, None], ids, eos)
    return ids, best_len


def tile_for_beams(tree, beam: int):
    """Repeat each leaf's batch dim W times: [B, ...] -> [B*W, ...]."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, beam, axis=0), tree
    )
