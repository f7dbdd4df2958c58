"""Inference: encoder pass + decoding strategy dispatch (ref: eval/demo
scripts, SURVEY.md §4.3 — minus the per-step Python loops).

Device side returns padded id tensors; host side maps ids to strings via the
vocab. The jitted programs are cached per (shape, strategy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lipreading_tpu.config import Config
from lipreading_tpu.models import transformer as tf
from lipreading_tpu.models.attention import (
    decoder_step as attn_step,
    precompute_attention,
)
from lipreading_tpu.models.lipreader import _act_dtype, ctc_logits, encode
from lipreading_tpu.models.nn import length_mask
from lipreading_tpu.ops.decode import (
    beam_search,
    ctc_greedy_ids,
    greedy_decode,
)
from lipreading_tpu.text import Vocab


def _attention_step_fn(params, cfg: Config, enc, enc_lengths, dtype):
    """Build (init_state, step_fn) for the configured attention decoder."""
    B, T, _ = enc.shape
    if cfg.encoder == "bigru":
        p = params["att_decoder"]
        enc_proj = precompute_attention(p, enc, dtype)
        enc_mask = length_mask(enc_lengths, T)
        H = p["gru"]["w_hh"].shape[0]
        state = {"h": jnp.zeros((B, H), enc.dtype)}

        def step(state, tok):
            h, logits = attn_step(
                p, state["h"], tok, enc, enc_proj, enc_mask, dtype
            )
            return {"h": h}, logits

        return state, step, None
    else:
        p = params["att_decoder"]
        # cache rides the activation dtype: decoder_step computes K/V in
        # ``dtype`` and downcasts cache reads back to it, so an fp32 cache
        # under bf16 activations stores exact-bf16 values at 2x the bytes —
        # pure waste on the per-step beam gather (the dominant HBM traffic
        # of wide-batch beam decode; fp32->bf16 of an exact-bf16 value is
        # exact, so this is bit-identical — pinned by
        # test_kv_cache_dtype_decode_identity)
        cache = tf.decoder_init_cache(
            p, B, cfg.train.max_decode_len, cfg.model.tf_heads,
            dtype or jnp.float32
        )
        # hoist cross-attention K/V out of the step loop: constant across
        # steps, identical across the beams of a sample (enc tiled by
        # repeat), so they close over the step fn and never ride the carry
        cross_kv = tf.decoder_cross_kv(p, enc, cfg.model.tf_heads, dtype)

        def step(cache, tok):
            return tf.decoder_step(
                p, cache, tok, enc, enc_lengths, cfg.model.tf_heads, dtype,
                cross_kv=cross_kv,
            )

        return cache, step, None


_LM_CACHE: dict = {}


def _load_lexicon():
    """Lazily build the fixture-corpus lexicon DFA (lexicon.py). Same
    trace-safety rule as _load_lm: resolve OUTSIDE jit."""
    if "lex" not in _LM_CACHE:
        from lipreading_tpu.lexicon import fixture_lexicon, to_jax

        _LM_CACHE["lex"] = to_jax(fixture_lexicon())
    return _LM_CACHE["lex"]


def _require_eager(x, what: str):
    """Refuse lazy host-side loads under jit tracing: the file I/O would run
    at trace time and the loaded tables would be baked in as compile-time
    constants. Callers that jit decode_ids must resolve the LM/lexicon
    eagerly and pass them in (streaming.py and _decode_jit do)."""
    if isinstance(x, jax.core.Tracer):
        raise ValueError(
            f"decode_ids: lazy {what} load requested under jit tracing; "
            f"load it eagerly (infer._load_lm/_load_lexicon) and pass it "
            f"in explicitly"
        )


def _load_lm():
    """Lazily load the shipped char LM (assets/char_lm.npz).

    MUST be called outside jit (tables are cached; a table first created
    under tracing leaks the trace — UnexpectedTracerError on the next
    compile). _decode_jit resolves it eagerly and closes over it.
    """
    if "lm" not in _LM_CACHE:
        import os

        from lipreading_tpu.lm import load_lm
        from lipreading_tpu.preproc_training import ASSETS_DIR

        path = os.path.join(ASSETS_DIR, "char_lm.npz")
        if os.path.exists(path):
            table, order = load_lm(path)
            _LM_CACHE["lm"] = (jnp.asarray(table), order)
        else:
            _LM_CACHE["lm"] = None
    return _LM_CACHE["lm"]


def decode_ids(params, cfg: Config, rois, frame_lengths, beam: int | None = None,
               lm_weight: float = 0.0, lm=None, lexicon=None):
    """[B, T, R, R] -> (ids [B, L], lengths [B]) on device.

    Strategy: CTC greedy for decoder="ctc" at beam <= 1, device-side exact
    CTC prefix beam (ops/joint_decode.ctc_prefix_beam_device) at beam > 1;
    attention greedy (beam in (0, 1)) or batched device beam search
    otherwise. Every path is one jitted program — no host decode loops
    (the reference's per-step Python beam, SURVEY.md §4.3, has no surviving
    analogue here).
    """
    enc = encode(params, cfg, rois, frame_lengths, _act_dtype(cfg))
    return decode_ids_from_enc(params, cfg, enc, frame_lengths, beam,
                               lm_weight, lm=lm, lexicon=lexicon)


def decode_ids_from_enc(params, cfg: Config, enc, frame_lengths,
                        beam: int | None = None, lm_weight: float = 0.0,
                        lm=None, lexicon=None):
    """Decode from a precomputed encoder output [B, T, D].

    Split out of :func:`decode_ids` so the cascade's rescore leg can reuse
    the encoder pass its greedy leg already ran (transcribe_cascade): the
    encoder output is a pure function of (params, rois, lengths), so
    re-encoding the uncertain rows is pure waste.
    """
    dtype = _act_dtype(cfg)
    vocab = Vocab()
    beam = cfg.train.beam_width if beam is None else beam
    max_len = cfg.train.max_decode_len
    B = enc.shape[0]
    if cfg.decoder == "ctc":
        logits = ctc_logits(params, enc)
        if beam > 1:
            from lipreading_tpu.ops.joint_decode import ctc_prefix_beam_device

            if lm is None and lm_weight > 0.0:
                _require_eager(frame_lengths, "LM")
                lm = _load_lm()
            return ctc_prefix_beam_device(
                logits, frame_lengths, beam, max_len,
                blank=vocab.blank_id, sos=vocab.sos_id, eos=vocab.eos_id,
                lexicon=lexicon, lm=lm, lm_weight=lm_weight,
            )
        if jax.default_backend() == "tpu":
            from lipreading_tpu.ops.decode_pallas import ctc_greedy_ids_pallas

            return ctc_greedy_ids_pallas(logits, frame_lengths,
                                         blank=vocab.blank_id)
        return ctc_greedy_ids(logits, frame_lengths, blank=vocab.blank_id)
    if beam <= 1:
        state, step, _ = _attention_step_fn(params, cfg, enc, frame_lengths, dtype)
        return greedy_decode(step, state, B, max_len, vocab.sos_id, vocab.eos_id)

    enc_t = jnp.repeat(enc, beam, axis=0)
    len_t = jnp.repeat(frame_lengths, beam, axis=0)
    state, step, _ = _attention_step_fn(params, cfg, enc_t, len_t, dtype)
    if cfg.decoder == "hybrid":
        # joint CTC/attention one-pass decoding (ops/joint_decode.py): the
        # frame-synchronous CTC prefix score vetoes attention loops;
        # optional shallow fusion with the shipped char LM (lm.py)
        from lipreading_tpu.ops.joint_decode import joint_beam_search

        if lm is None and lm_weight > 0.0:
            _require_eager(frame_lengths, "LM")
            lm = _load_lm()
        ctc_t = jnp.repeat(ctc_logits(params, enc), beam, axis=0)
        return joint_beam_search(
            step, state, ctc_t, len_t, B, beam, max_len,
            vocab.sos_id, vocab.eos_id, blank=vocab.blank_id,
            ctc_weight=cfg.train.ctc_weight,
            length_penalty=cfg.train.length_penalty,
            lm=lm, lm_weight=lm_weight, lexicon=lexicon,
        )
    return beam_search(
        step, state, B, beam, max_len, vocab.sos_id, vocab.eos_id,
        length_penalty=cfg.train.length_penalty,
    )


_JIT_CACHE: dict = {}


def _decode_jit(cfg: Config, beam: int, lm_weight: float = 0.0,
                use_lexicon: bool = False):
    """Per-(config, beam, lm, lexicon) jitted decode closure."""
    import json

    key = (json.dumps(cfg.to_dict(), sort_keys=True, default=str), beam,
           lm_weight, use_lexicon)
    if key not in _JIT_CACHE:
        lm = _load_lm() if lm_weight > 0.0 else None   # resolve OUTSIDE jit
        lex = _load_lexicon() if use_lexicon else None
        _JIT_CACHE[key] = jax.jit(
            lambda p, r, l: decode_ids(p, cfg, r, l, beam, lm_weight, lm=lm,
                                       lexicon=lex)
        )
    return _JIT_CACHE[key]


def _decode_from_enc_jit(cfg: Config, beam: int, lm_weight: float = 0.0,
                         use_lexicon: bool = False):
    """Like _decode_jit but from a precomputed encoder output (the cascade's
    rescore leg — its greedy leg already encoded every row)."""
    import json

    key = ("from_enc", json.dumps(cfg.to_dict(), sort_keys=True, default=str),
           beam, lm_weight, use_lexicon)
    if key not in _JIT_CACHE:
        lm = _load_lm() if lm_weight > 0.0 else None   # resolve OUTSIDE jit
        lex = _load_lexicon() if use_lexicon else None
        _JIT_CACHE[key] = jax.jit(
            lambda p, e, l: decode_ids_from_enc(p, cfg, e, l, beam, lm_weight,
                                                lm=lm, lexicon=lex)
        )
    return _JIT_CACHE[key]


def ctc_log_probs(params, cfg: Config, rois, frame_lengths):
    """[B, T, R, R] -> [B, T, V] log-posteriors (CTC head)."""
    enc = encode(params, cfg, rois, frame_lengths, _act_dtype(cfg))
    return jax.nn.log_softmax(ctc_logits(params, enc), axis=-1)


def _greedy_conf_jit(cfg: Config):
    """Per-(config) jitted CTC-greedy + per-sample confidence.

    Confidence = mean over valid frames of the top1-top2 log-posterior
    margin of the CTC head — large when the lattice is unambiguous (the
    beam cannot find a better path), small when rescoring might matter.

    Also returns the encoder output so the cascade's rescore leg can decode
    from it directly (decode_ids_from_enc) instead of re-encoding.
    """
    import json

    key = ("greedy_conf", json.dumps(cfg.to_dict(), sort_keys=True,
                                     default=str))
    if key not in _JIT_CACHE:
        vocab = Vocab()

        def f(p, r, l):
            enc = encode(p, cfg, r, l, _act_dtype(cfg))
            logp = jax.nn.log_softmax(ctc_logits(p, enc), axis=-1)
            top2 = jax.lax.top_k(logp, 2)[0]                    # [B, T, 2]
            margin = top2[..., 0] - top2[..., 1]
            mask = length_mask(l, logp.shape[1]).astype(jnp.float32)
            conf = (margin * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)
            ids, lens = ctc_greedy_ids(logp, l, blank=vocab.blank_id)
            return ids, lens, conf, enc

        _JIT_CACHE[key] = jax.jit(f)
    return _JIT_CACHE[key]


def transcribe_cascade(params, cfg: Config, rois, frame_lengths,
                       beam: int | None = None, vocab: Vocab | None = None,
                       lm_weight: float = 0.0, use_lexicon: bool = False,
                       margin: float = 8.0, lm_margin: float = 1.35,
                       lm_min_chars: int = 4, oov_trigger: bool = True,
                       oov_words=None, rescore_bucket: int = 8,
                       return_flags: bool = False):
    """Cascade decoding (VERDICT r2 weak #4: the quality config pays a 12x
    decode tax): CTC-greedy everything, then run the expensive joint/prefix
    beam (+LM/lexicon) ONLY on uncertain clips. Confident clips keep the
    greedy transcript — on release-quality models most clips are
    unambiguous, so the beam runs on a small bucket.

    Two triggers route a clip to the beam:
    * CTC margin: mean top1-top2 log-posterior gap below ``margin`` nats
      (the lattice itself is ambiguous);
    * LM score (when ``lm_weight`` > 0): the greedy transcript's per-char
      NLL under the shipped char LM above ``lm_margin`` nats (non-word output —
      the case where LM fusion flips the decode but frame margins cannot
      see it; measured on the release eval set, the one beam-corrected clip
      had the HIGHEST greedy LM NLL while its CTC margin was unremarkable).
      Applied only to transcripts of >= ``lm_min_chars`` chars: a correct
      3-char single word ('she', 'way', 'how') has high per-char NLL from
      its boundary transitions alone — measured on the 17-sample heldout
      dataview, the un-gated trigger's 5 false positives were ALL such
      words, while short non-words ('tht') stay caught by the OOV trigger;
    * out-of-lexicon word (``oov_trigger``, default on): the greedy
      transcript contains a word outside the corpus lexicon. Short
      non-words like 'tht'/'wen' (greedy dropping one letter) can slip
      UNDER the char-LM NLL threshold because every bigram in them is
      common — a closed-vocabulary membership test catches exactly the
      beam-correctable misses that scores cannot.

    Returns (transcripts, n_rescored) — or (transcripts, flags [B] bool)
    when ``return_flags``, so a caller that padded the batch with
    duplicate rows can count rescores over the real rows only. At
    ``margin=inf`` every clip is rescored (== transcribe); with every
    trigger off (margin=0, lm_margin=inf, oov_trigger=False) none are
    (== pure greedy).
    """
    vocab = vocab or Vocab()
    beam = cfg.train.beam_width if beam is None else beam
    rois = jnp.asarray(rois)
    frame_lengths = jnp.asarray(frame_lengths)
    ids, lens, conf, enc = _greedy_conf_jit(cfg)(params, rois, frame_lengths)
    ids, lens = np.asarray(ids), np.asarray(lens)
    out = [vocab.decode(ids[b, : lens[b]]) for b in range(ids.shape[0])]
    uncertain = np.asarray(conf) < margin
    if lm_weight > 0.0 and np.isfinite(lm_margin):
        lm = _load_lm()
        if lm is not None:
            from lipreading_tpu.lm import lm_nll_per_char

            table, order = np.asarray(lm[0]), lm[1]
            lm_nll = np.asarray(
                [lm_nll_per_char(table, order, t, vocab) for t in out])
            long_enough = np.asarray([len(t) >= lm_min_chars for t in out])
            uncertain |= (lm_nll > lm_margin) & long_enough
    if oov_trigger:
        if oov_words is None:
            # default closed vocabulary = the corpus lexicon; deployments
            # with their own vocabulary pass ``oov_words`` explicitly
            from lipreading_tpu.fixtures import LEXICON

            oov_words = set(LEXICON)
        uncertain |= np.asarray(
            [any(w not in oov_words for w in t.split()) for t in out])
    idx = np.nonzero(uncertain)[0]
    if beam > 1 and idx.size:
        # pad the uncertain set to a bucket multiple by repeating the last
        # clip: one compiled shape per bucket count, duplicates discarded.
        # The rescore leg decodes FROM the greedy leg's encoder output —
        # re-encoding the uncertain rows would redo work the greedy pass
        # already paid for (encode is a pure function of its inputs).
        n = idx.size
        take = np.concatenate(
            [idx, np.repeat(idx[-1:], -n % rescore_bucket)])
        sids, slens = _decode_from_enc_jit(cfg, beam, lm_weight, use_lexicon)(
            params, enc[take], frame_lengths[take])
        sids, slens = np.asarray(sids), np.asarray(slens)
        for k, b in enumerate(idx):
            out[int(b)] = vocab.decode(sids[k, : slens[k]])
    if return_flags:
        return out, uncertain
    return out, int(idx.size)


def frame_signature(frames, grid: int = 16) -> np.ndarray:
    """[N, H, W, 3] uint8 -> [N, grid, grid] block-mean gray in [0, 1].

    The shot-boundary signal (VERDICT r3 #7). The mouth ROI itself cannot
    detect hard cuts — talking motion moves as many ROI pixels per frame as
    a face swap does (measured: within-shot ROI diff max 0.74 vs cut 0.36)
    — but the FULL frame separates cleanly: background and framing are
    static within a shot, so the block-mean signature's consecutive-frame
    L1 jumps 17-28x its within-shot median at a hard cut while never
    exceeding ~3x within one (fixtures, same- and cross-style pairs).
    """
    f = np.asarray(frames)
    g = f.astype(np.float32).mean(-1) if f.ndim == 4 else f.astype(np.float32)
    N, H, W = g.shape
    H2, W2 = H - H % grid, W - W % grid
    s = g[:, :H2, :W2].reshape(
        N, grid, H2 // grid, grid, W2 // grid).mean((2, 4))
    return s / 255.0


def signature_cuts(sig: np.ndarray, cut_k: float = 8.0,
                   cut_min: float = 0.02) -> np.ndarray:
    """Hard-cut frame indices from a [N, g, g] signature sequence.

    A cut at index i means frames i-1 and i straddle a shot boundary.
    Threshold is relative (``cut_k`` x the sequence's median
    consecutive-frame diff) with an absolute floor ``cut_min`` so a
    near-static stream cannot fire on noise.
    """
    sig = np.asarray(sig)
    if sig.shape[0] < 2:
        return np.zeros((0,), np.int64)
    d = np.abs(np.diff(sig, axis=0)).mean(axis=(1, 2))
    thr = max(cut_min, cut_k * float(np.median(d)))
    return np.flatnonzero(d > thr) + 1


def segment_valid_runs(valid, gap: int = 25) -> list[tuple[int, int]]:
    """Split a frame-validity mask into shot segments.

    A run of >= ``gap`` consecutive no-face frames is a shot boundary
    (cutaway). Decoding one concatenation across a cut is
    out-of-distribution for the batch model (measured: 0.10-0.23 CER on
    2-clip cutaway streams where per-segment decode is exact — the encoder
    attends across the cut), so each segment must decode within its own
    shot, mirroring streaming's ``gap_flush``. Returns ``[start, end)``
    spans over the ORIGINAL frame axis; a span may still contain short
    invalid flickers, which the caller drops (skip-frame semantics).
    ``gap <= 0`` disables splitting: one span covering all valid frames.
    """
    valid = np.asarray(valid).astype(bool)
    idx = np.flatnonzero(valid)
    if idx.size == 0:
        return []
    if gap <= 0:
        return [(int(idx[0]), int(idx[-1]) + 1)]
    segs = []
    start = prev = int(idx[0])
    for i in idx[1:]:
        if int(i) - prev - 1 >= gap:
            segs.append((start, prev + 1))
            start = int(i)
        prev = int(i)
    segs.append((start, prev + 1))
    return segs


def transcribe_segmented(params, cfg: Config, rois, valid, gap: int = 25,
                         bucket: int = 64, cascade: bool = False,
                         sig=None, cut_k: float = 8.0, cut_min: float = 0.02,
                         **decode_kw):
    """Tracked batch decode with shot-boundary segmentation.

    ``rois`` [N, R, R] and ``valid`` [N] come from
    ``ops.preprocess.preprocess_padded_tracked`` over the original frame
    axis. Segments split at >= ``gap`` invalid frames decode as ONE batched
    ``transcribe`` call (invalid flickers inside a segment are compacted
    out; segments pad to a shared ``bucket`` multiple so multi-shot videos
    reuse the same compiled decode as equal-length batches). Returns
    ``(text, [((start, end), segment_text), ...])`` — text joins the
    segments with spaces (a cut is at least a word boundary).

    ``sig`` (optional): per-frame appearance signatures from
    ``frame_signature(frames)`` over the SAME frame axis. When given,
    segments additionally split at HARD CUTS — shot changes without a
    no-face gap (two faces back to back), which detection dropout cannot
    see (``signature_cuts``; VERDICT r3 #7).
    """
    valid = np.asarray(valid).astype(bool)
    rois = np.asarray(rois)
    segs = segment_valid_runs(valid, gap)
    if sig is not None and segs:
        cuts = signature_cuts(sig, cut_k, cut_min)
        split = []
        for lo, hi in segs:
            for c in cuts[(cuts > lo) & (cuts < hi)]:
                if valid[lo:c].any():
                    split.append((lo, int(c)))
                lo = int(c)
            if valid[lo:hi].any():
                split.append((lo, hi))
        segs = split
    if not segs:
        return "", []
    seg_rois = [rois[lo:hi][valid[lo:hi]] for lo, hi in segs]
    lens = [int(r.shape[0]) for r in seg_rois]
    # segments group by their length bucket before batching: padding a
    # short segment out to a long segment's bucket shifts its features
    # under the releases' time-pooled GroupNorm (nn.groupnorm docstring) —
    # same-bucket batches match how the models train and evaluate.
    # Framewise-norm models are pad-invariant (test-pinned), so the crutch
    # demotes to ONE shared bucket / one batched call (VERDICT r3 #3).
    buckets: dict[int, list[int]] = {}
    if cfg.model.framewise_norm:
        buckets[-(-max(lens) // bucket) * bucket] = list(range(len(segs)))
    else:
        for i, L in enumerate(lens):
            buckets.setdefault(-(-L // bucket) * bucket, []).append(i)
    texts = [""] * len(segs)
    for tb, idxs in sorted(buckets.items()):
        batch = np.zeros((len(idxs), tb) + rois.shape[1:], rois.dtype)
        for k, i in enumerate(idxs):
            batch[k, : lens[i]] = seg_rois[i]
        blens = np.asarray([lens[i] for i in idxs], np.int32)
        if cascade:
            # serving path: greedy everything, beam-rescore only
            # trigger-flagged segments (transcribe_cascade)
            sub, _ = transcribe_cascade(params, cfg, batch, blens,
                                        **decode_kw)
        else:
            sub = transcribe(params, cfg, batch, blens, **decode_kw)
        for k, i in enumerate(idxs):
            texts[i] = sub[k]
    text = " ".join(t for t in texts if t)
    return text, list(zip(segs, texts))


def transcribe(params, cfg: Config, rois, frame_lengths,
               beam: int | None = None, vocab: Vocab | None = None,
               lm_weight: float = 0.0, use_lexicon: bool = False) -> list[str]:
    """Batch of ROI sequences -> transcripts (host strings).

    ``use_lexicon``: constrain beam decodes (CTC prefix beam / joint) to the
    fixture-corpus word lexicon with word-LM boundary rescoring
    (lipreading_tpu/lexicon.py). Greedy decodes ignore it.
    """
    vocab = vocab or Vocab()
    beam = cfg.train.beam_width if beam is None else beam
    ids, lengths = _decode_jit(cfg, beam, lm_weight, use_lexicon)(
        params, jnp.asarray(rois), jnp.asarray(frame_lengths)
    )
    ids = np.asarray(ids)
    lengths = np.asarray(lengths)
    out = []
    for b in range(ids.shape[0]):
        # CTC ids are already collapsed on device; attention ids are raw —
        # vocab.decode drops specials either way
        out.append(vocab.decode(ids[b, : lengths[b]]))
    return out
