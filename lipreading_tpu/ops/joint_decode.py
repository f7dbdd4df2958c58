"""Joint CTC/attention one-pass beam search (Watanabe et al., "Hybrid
CTC/Attention Architecture for End-to-End Speech Recognition") — the decode
mode the hybrid loss (LCANet-style cascaded attention+CTC, PAPERS.md
1803.04988) exists to support.

Why: label-synchronous attention decoders hallucinate/loop on
out-of-distribution input lengths (observed: 'had ad ad ad...' on full-clip
eval); the frame-synchronous CTC lattice cannot loop. Scoring every beam
expansion with lambda * ctc_prefix + (1 - lambda) * attention combines both.

TPU shape: everything runs in ONE jitted lax.scan like ops/decode.beam_search,
with extra per-beam CTC prefix state (r_n/r_b forward arrays over the T
frames). Per step, the prefix scores psi for ALL vocabulary extensions are
scan-free (one masked logsumexp over the emission array); only the top-k
SELECTED tokens get their successor lattices rebuilt, with two log-semiring
associative scans over [T, batch*beam] — O(T log T) depth, V-fold less scan
work than scoring-then-scanning every candidate, and no reference-style
per-hypothesis Python loops anywhere.

Math (log domain; g = current prefix, h = g + c, c != blank):
    phi_t(g, c)  = logaddexp(r_b_t(g), [c != last(g)] r_n_t(g))
    r_n_t(h)     = logaddexp(r_n_{t-1}(h), phi_{t-1}) + lp_t(c)
    r_b_t(h)     = logaddexp(r_b_{t-1}(h), r_n_{t-1}(h)) + lp_t(blank)
    psi(h)       = logsumexp_t [ phi_{t-1} + lp_t(c) ]      (prefix score)
    score(eos|g) = logaddexp(r_n_T(g), r_b_T(g))            (full-seq prob)
Both recurrences are first-order linear in the (logaddexp, +) semiring, so
lax.associative_scan evaluates them in parallel over t.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _semiring_scan(a, b):
    """Solve r_t = a_t + r_{t-1}  (logaddexp)  b_t along axis 0.

    a, b: [T, ...]. Returns r: [T, ...] with r_{-1} = -inf.
    """

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 + a2, jnp.logaddexp(b1 + a2, b2)

    _, r = jax.lax.associative_scan(combine, (a, b), axis=0)
    return r


def init_ctc_prefix_state(lp: jnp.ndarray, blank: int):
    """Per-sequence CTC prefix state for the empty prefix.

    lp: [N, T, V] masked log-posteriors (see mask_ctc_logp). Returns dict with
    r_n/r_b [N, T], psi [N], last [N], empty [N].
    """
    N, T, V = lp.shape
    r_b = jnp.cumsum(lp[:, :, blank], axis=1)          # all-blank paths
    r_n = jnp.full((N, T), NEG_INF)
    return {
        "r_n": r_n,
        "r_b": r_b,
        "psi": jnp.zeros((N,)),                        # psi(empty) = log 1
        "last": jnp.full((N,), -1, jnp.int32),
        "empty": jnp.ones((N,), bool),
    }


def mask_ctc_logp(logits: jnp.ndarray, lengths: jnp.ndarray,
                  blank: int) -> jnp.ndarray:
    """log_softmax over V, then frames past each length emit blank freely
    (lp[blank]=0, others=-inf) so static-T arrays equal the truncated math."""
    B, T, V = logits.shape
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
    pad_row = jnp.full((V,), NEG_INF).at[blank].set(0.0)
    return jnp.where(valid, lp, pad_row[None, None, :])


def ctc_candidate_scores(state, lp, blank: int):
    """Prefix scores for ALL vocab extensions of each prefix — scan-free.

    state: dict from init_ctc_prefix_state, leaves [N, ...]; lp: [N, T, V].
    Returns (psi_ext [N, V], full_logp [N], emit [N, T, V]): prefix scores
    per candidate, the full-sequence probability of the current prefix (the
    eos score), and the emission array — enough to rebuild the successor
    lattice of WHICHEVER candidate the beam later selects
    (ctc_chosen_lattice). Computing the lattices only for selected tokens
    (not all V) shrinks the per-step associative scans by a factor of V —
    the dominant cost of the joint decode.
    """
    N, T, V = lp.shape
    r_n, r_b = state["r_n"], state["r_b"]
    last, empty = state["last"], state["empty"]

    same = jnp.arange(V)[None, :] == last[:, None]           # [N, V]
    phi = jnp.logaddexp(
        r_b[:, :, None],
        jnp.where(same[:, None, :], NEG_INF, r_n[:, :, None]),
    )                                                        # [N, T, V]
    # phi_{t-1}: shift with the virtual t=-1 slot (0 for the empty prefix)
    init_slot = jnp.where(empty, 0.0, NEG_INF)[:, None]      # [N, 1]
    phi_prev = jnp.concatenate(
        [jnp.broadcast_to(init_slot[:, :, None], (N, 1, V)), phi[:, :-1, :]],
        axis=1,
    )                                                        # [N, T, V]

    emit = phi_prev + lp                                     # [N, T, V]
    psi_ext = jax.scipy.special.logsumexp(emit, axis=1)      # [N, V]
    full_logp = jnp.logaddexp(r_n[:, -1], r_b[:, -1])        # [N]
    return psi_ext, full_logp, emit


def ctc_chosen_lattice(emit_c, lp_c, lp_blank):
    """Successor lattice for ONE chosen extension per beam.

    emit_c / lp_c / lp_blank: [N, T] — the emit row and log-probs of the
    selected token c and of blank. Returns (r_n [N, T], r_b [N, T]) via the
    same log-semiring associative scans, V-fold smaller than scanning every
    candidate.
    """
    N, T = emit_c.shape
    a_n = jnp.moveaxis(lp_c, 1, 0)                           # [T, N]
    b_n = jnp.moveaxis(emit_c, 1, 0)
    r_n = jnp.moveaxis(_semiring_scan(a_n, b_n), 0, 1)       # [N, T]
    r_n_prev = jnp.concatenate(
        [jnp.full((N, 1), NEG_INF), r_n[:, :-1]], axis=1
    )
    a_b = jnp.moveaxis(lp_blank, 1, 0)
    b_b = jnp.moveaxis(r_n_prev + lp_blank, 1, 0)
    r_b = jnp.moveaxis(_semiring_scan(a_b, b_b), 0, 1)       # [N, T]
    return r_n, r_b


def ctc_prefix_beam_device(logits: jnp.ndarray, lengths: jnp.ndarray,
                           beam: int, max_len: int, blank: int = 0,
                           sos: int = 1, eos: int = 2, lexicon=None,
                           lm=None, lm_weight: float = 0.0):
    """Exact CTC prefix beam search as ONE jitted device program.

    Label-synchronous specialization of :func:`joint_beam_search` at
    ``ctc_weight=1`` with a flat (zero-logit) attention model — the attention
    term contributes exactly 0 to every expansion, so the search ranks
    hypotheses purely by the CTC prefix scores psi / full-sequence
    probabilities from the associative-scan lattice. Replaces the
    reference-shaped host-side per-utterance Python beam loop
    (ops/ctc_beam.py, SURVEY.md §4.3), which is retained as the test oracle
    only; test_joint_decode.py pins the λ=1 equivalence.

    logits: [B, T, V] raw CTC head outputs (pre-log-softmax);
    lengths: [B]. Returns (ids [B, max_len], out_lengths [B]).
    """
    B, T, V = logits.shape
    BW = B * beam

    def flat_att(state, toks):
        return state, jnp.zeros((BW, V), jnp.float32)

    return joint_beam_search(
        flat_att, {"_": jnp.zeros((BW,), jnp.float32)},
        jnp.repeat(logits, beam, axis=0),
        jnp.repeat(lengths, beam, axis=0),
        B, beam, max_len, sos, eos, blank=blank,
        ctc_weight=1.0, length_penalty=0.0,
        require_finished=True, lexicon=lexicon,
        lm=lm, lm_weight=lm_weight,
    )


def joint_beam_search(
    att_step_fn,
    att_state,
    ctc_logits: jnp.ndarray,
    frame_lengths: jnp.ndarray,
    batch: int,
    beam: int,
    max_len: int,
    sos: int,
    eos: int,
    blank: int = 0,
    ctc_weight: float = 0.3,
    length_penalty: float = 0.0,
    lm=None,
    lm_weight: float = 0.0,
    require_finished: bool = False,
    lexicon=None,
    lexicon_weight: float = 0.0,
):
    """One-pass joint decode. ``att_state`` leaves and ``ctc_logits``/
    ``frame_lengths`` must already be tiled to B*W (like ops.decode
    beam_search). Returns (ids [B, max_len], lengths [B]).

    ``lm``: optional (table [V^(n-1), V] jnp array, order) for shallow
    fusion — adds lm_weight * log P_lm(c | context) to every expansion
    (lipreading_tpu/lm.py).

    ``lexicon``: optional DFA tables (lipreading_tpu/lexicon.py, to_jax):
    every beam carries a trie state; expansions off the lexicon are masked
    to -inf and word boundaries add lexicon_weight * log P(word). The
    default weight 0 makes it a PURE constraint — measured: a uniform
    word-LM bonus at weight 1 penalizes spaces enough to merge words and
    hurt CER on clips the unconstrained beam already gets right."""
    BW = batch * beam
    lp = mask_ctc_logp(ctc_logits, frame_lengths, blank)     # [BW, T, V]
    V = lp.shape[-1]
    ctc_state = init_ctc_prefix_state(lp, blank)
    if lm is not None:
        from lipreading_tpu.lm import advance_context, initial_context

        lm_table, lm_order = lm
        lm_ctx0 = initial_context(BW, lm_order)
    else:
        lm_table = lm_order = lm_ctx0 = None
    lex_next = lexicon["next_state"] if lexicon is not None else None
    lex_bonus = lexicon["bonus"] if lexicon is not None else None

    def body(carry, _):
        att, ctc, lm_ctx, lex_state, scores, toks, finished, lengths = carry
        att, att_logits = att_step_fn(att, toks.reshape(BW))
        att_lp = jax.nn.log_softmax(att_logits.astype(jnp.float32), axis=-1)

        psi_ext, full_lp, emit = ctc_candidate_scores(ctc, lp, blank)
        delta = psi_ext - ctc["psi"][:, None]                # [BW, V]
        delta = delta.at[:, eos].set(full_lp - ctc["psi"])
        # attention never legally emits blank/sos; CTC never emits them either
        bad = jnp.zeros((V,), bool).at[blank].set(True).at[sos].set(True)
        joint = (1.0 - ctc_weight) * att_lp + ctc_weight * delta
        if lm_table is not None:
            joint = joint + lm_weight * lm_table[lm_ctx]     # [BW, V] fusion
        if lex_next is not None:
            # hard lexicon constraint + word-LM boundary bonus: one gather
            add = lex_bonus[lex_state]                       # [BW, V]
            joint = joint + jnp.where(add > NEG_INF / 2,
                                      lexicon_weight * add, NEG_INF)
        joint = jnp.where(bad[None, :], NEG_INF, joint)
        joint = joint.reshape(batch, beam, V)

        eos_only = jnp.full((V,), NEG_INF).at[eos].set(0.0)
        joint = jnp.where(finished[:, :, None], eos_only[None, None, :], joint)
        total = scores[:, :, None] + joint
        new_scores, idx = jax.lax.top_k(total.reshape(batch, beam * V), beam)
        src_beam = idx // V
        new_tok = (idx % V).astype(jnp.int32)

        def gather_beam(x):
            xs = x.reshape(batch, beam, *x.shape[1:])
            g = jnp.take_along_axis(
                xs, src_beam.reshape(batch, beam, *([1] * (xs.ndim - 2))),
                axis=1,
            )
            return g.reshape(BW, *x.shape[1:])

        att = jax.tree.map(gather_beam, att)
        # build successor CTC lattices ONLY for the chosen (beam, token)
        # pairs: scans over [T, BW] instead of [T, BW, V]
        flat_tok = new_tok.reshape(BW)
        emit_c = jnp.take_along_axis(
            gather_beam(emit), flat_tok[:, None, None], axis=2
        )[:, :, 0]                                           # [BW, T]
        # lp is identical across the beams of one sample (tiled by repeat),
        # so no beam gather is needed for it
        lp_c = jnp.take_along_axis(
            lp, flat_tok[:, None, None], axis=2
        )[:, :, 0]
        r_n_sel, r_b_sel = ctc_chosen_lattice(emit_c, lp_c, lp[:, :, blank])
        chose_eos = (flat_tok == eos) | gather_beam(
            finished.reshape(BW)
        )
        new_ctc = {
            "r_n": jnp.where(chose_eos[:, None],
                             gather_beam(ctc["r_n"]), r_n_sel),
            "r_b": jnp.where(chose_eos[:, None],
                             gather_beam(ctc["r_b"]), r_b_sel),
            "psi": jnp.where(
                chose_eos,
                gather_beam(ctc["psi"]),
                jnp.take_along_axis(gather_beam(psi_ext),
                                    flat_tok[:, None], axis=1)[:, 0],
            ),
            "last": jnp.where(chose_eos, gather_beam(ctc["last"]), flat_tok),
            "empty": jnp.zeros((BW,), bool),  # every live beam has emitted
        }
        if lm_table is not None:
            lm_ctx = advance_context(
                gather_beam(lm_ctx), flat_tok, lm_order, V
            )
        if lex_next is not None:
            g = gather_beam(lex_state)
            stepped = jnp.take_along_axis(
                lex_next[g], flat_tok[:, None], axis=1
            )[:, 0]
            # finished beams re-emit eos; keep their state frozen
            lex_state = jnp.where(chose_eos, g, jnp.maximum(stepped, 0))
        finished = jnp.take_along_axis(finished, src_beam, axis=1)
        lengths = jnp.take_along_axis(lengths, src_beam, axis=1)
        lengths = lengths + (~finished).astype(jnp.int32)
        finished = finished | (new_tok == eos)
        return (att, new_ctc, lm_ctx, lex_state, new_scores, new_tok, finished,
                lengths), (new_tok, src_beam)

    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((beam - 1,), NEG_INF)])[None],
        (batch, 1),
    )
    toks0 = jnp.full((batch, beam), sos, jnp.int32)
    fin0 = jnp.zeros((batch, beam), bool)
    len0 = jnp.zeros((batch, beam), jnp.int32)
    lm_carry = lm_ctx0 if lm_table is not None else jnp.zeros((BW,), jnp.int32)
    lex_carry = jnp.zeros((BW,), jnp.int32)        # DFA root
    # all-finished early exit (ops/decode.early_exit_scan): buffers are
    # prefilled with eos tokens + identity backpointers — exactly what the
    # skipped post-finish steps would write — so backtrack/selection below
    # is untouched.
    from lipreading_tpu.ops.decode import early_exit_scan

    toks_buf0 = jnp.full((max_len, batch, beam), eos, jnp.int32)
    srcs_buf0 = jnp.tile(
        jnp.arange(beam, dtype=jnp.int32)[None, None], (max_len, batch, 1)
    )
    (_, _, _, _, scores, _, finished, lengths), (toks, srcs) = early_exit_scan(
        body,
        (att_state, ctc_state, lm_carry, lex_carry, scores0, toks0, fin0,
         len0),
        lambda c: c[6],
        (toks_buf0, srcs_buf0), max_len,
    )

    def backtrack(carry, xs):
        beam_idx = carry
        tok_t, src_t = xs
        tok = jnp.take_along_axis(tok_t, beam_idx, axis=1)
        beam_idx = jnp.take_along_axis(src_t, beam_idx, axis=1)
        return beam_idx, tok

    final_idx = jnp.tile(jnp.arange(beam)[None], (batch, 1))
    _, rev_toks = jax.lax.scan(backtrack, final_idx, (toks[::-1], srcs[::-1]))
    seq = jnp.moveaxis(jnp.moveaxis(rev_toks[::-1], 0, 1), 2, 1)  # [B, W, L]

    norm = ((lengths.astype(jnp.float32) + 5.0) / 6.0) ** length_penalty
    sel = scores / jnp.maximum(norm, 1e-6)
    if require_finished:
        # pure-CTC mode: an UNfinished beam carries psi(prefix) — the mass of
        # ALL completions — which structurally dominates any finished beam's
        # full-sequence score. Selecting it would return a spuriously long
        # prefix; restrict to finished hypotheses (fall back to raw scores
        # only if nothing finished within max_len).
        masked = jnp.where(finished, sel, NEG_INF)
        sel = jnp.where(finished.any(axis=1, keepdims=True), masked, sel)
    best = jnp.argmax(sel, axis=1)
    ids = jnp.take_along_axis(seq, best[:, None, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    pos = jnp.arange(max_len)[None, :]
    ids = jnp.where(pos < best_len[:, None], ids, eos)
    return ids, best_len
