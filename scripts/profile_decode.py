#!/usr/bin/env python
"""Component-level wall-time split of the flagship DECODE path (VERDICT r3
next-step #2: "profile the joint-beam step latency the way profile_train.py
profiled training").

The quality config (joint CTC/attention beam 8 + LM fusion) is
latency-bound: per-call wall time barely moves with batch. This isolates
where that latency lives, the same honest way as profile_train.py (jit each
component at the exact flagship shapes, forced D2H readback):

  encode          transformer encoder fwd at [B, T, 96, 96]
  greedy+conf     the cascade's cheap leg (CTC greedy + margin confidence)
  beam@L          full joint beam at max_decode_len=L (the scan length
                  lever: rescoring only needs greedy_len + slack steps)
  att-steps       L sequential transformer decoder steps alone (kv cache)
  ctc-scores      L sequential ctc_candidate_scores + chosen-lattice steps
                  alone (the prefix-lattice recurrences)
  topk+gather     estimated as beam@L - att-steps - ctc-scores (residual)

Usage: python scripts/profile_decode.py [B=32] [T=64] [beam=8] [reps=5]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lipreading_tpu.config import parse_overrides  # noqa: E402


def timeit(fn, *args, reps=5):
    import jax
    import numpy as _np

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    if leaves:
        _np.asarray(leaves[0]).ravel()[0]      # forced D2H (CLAUDE.md)
    return (time.perf_counter() - t0) / reps


def main(argv):
    args = parse_overrides(argv)
    B = int(args.pop("B", 32))
    T = int(args.pop("T", 64))
    beam = int(args.pop("beam", 8))
    reps = int(args.pop("reps", 5))
    lm_weight = float(args.pop("lm_weight", 0.4))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lipreading_tpu.infer import _load_lm
    from lipreading_tpu.models import transformer as tf
    from lipreading_tpu.models.lipreader import _act_dtype, ctc_logits, encode
    from lipreading_tpu.ops import joint_decode as jd
    from lipreading_tpu.preproc_training import load_release_model

    rel = load_release_model("transformer_hybrid")
    if rel is None:
        raise SystemExit("release asset missing")
    params, cfg = rel
    dtype = _act_dtype(cfg)
    vocab_V = cfg.model.vocab_size
    rng = np.random.default_rng(0)
    rois = jnp.asarray(rng.standard_normal((B, T, 96, 96), np.float32))
    lengths = jnp.full((B,), T - 4, jnp.int32)
    BW = B * beam
    rows = []

    print(f"# B={B} T={T} beam={beam} V={vocab_V} backend="
          f"{jax.default_backend()}", flush=True)

    def add(name, t):
        rows.append((name, t))
        print(f"{name:>28}: {t * 1e3:9.2f} ms", flush=True)

    enc_j = jax.jit(lambda p, r, l: encode(p, cfg, r, l, dtype))
    add("encode", timeit(enc_j, params, rois, lengths, reps=reps))

    from lipreading_tpu.infer import _greedy_conf_jit

    add("greedy+conf", timeit(_greedy_conf_jit(cfg), params, rois, lengths,
                              reps=reps))

    from lipreading_tpu.infer import _decode_jit

    for L in (cfg.train.max_decode_len, 32, 24):
        c2 = cfg.override(**{"train.max_decode_len": L})
        add(f"beam@{L}", timeit(_decode_jit(c2, beam, lm_weight), params,
                                rois, lengths, reps=reps))

    # --- isolated attention decoder steps (the sequential transformer) ---
    enc = enc_j(params, rois, lengths)
    enc_t = jnp.repeat(enc, beam, axis=0)
    len_t = jnp.repeat(lengths, beam, axis=0)
    L = cfg.train.max_decode_len
    p_dec = params["att_decoder"]

    def att_only(p, enc_t, len_t):
        cache = tf.decoder_init_cache(p, BW, L, cfg.model.tf_heads,
                                      dtype)      # act-dtype cache (infer.py)
        # match the production step (infer._attention_step_fn): cross K/V
        # hoisted out of the loop
        ckv = tf.decoder_cross_kv(p, enc_t, cfg.model.tf_heads, dtype)

        def body(c, tok):
            c2, logits = tf.decoder_step(p, c, tok, enc_t, len_t,
                                         cfg.model.tf_heads, dtype,
                                         cross_kv=ckv)
            return c2, logits.max()

        _, outs = jax.lax.scan(body, cache,
                               jnp.ones((L, BW), jnp.int32))
        return outs.sum()

    t_att = timeit(jax.jit(att_only), p_dec, enc_t, len_t, reps=reps)
    add(f"att-steps x{L}", t_att)

    # --- isolated CTC prefix-lattice steps ---
    logits_c = jax.jit(lambda p, e: ctc_logits(p, e))(params, enc)
    ctc_t = jnp.repeat(logits_c, beam, axis=0)

    def ctc_only(ctc_t, len_t):
        lp = jd.mask_ctc_logp(ctc_t, len_t, 0)
        state = jd.init_ctc_prefix_state(lp, 0)

        def body(st, tok):
            psi_ext, full_lp, emit = jd.ctc_candidate_scores(st, lp, 0)
            emit_c = jnp.take_along_axis(
                emit, tok[:, None, None], axis=2)[:, :, 0]
            lp_c = jnp.take_along_axis(lp, tok[:, None, None], axis=2)[:, :, 0]
            r_n, r_b = jd.ctc_chosen_lattice(emit_c, lp_c, lp[:, :, 0])
            st2 = dict(st, r_n=r_n, r_b=r_b,
                       psi=jnp.take_along_axis(psi_ext, tok[:, None],
                                               axis=1)[:, 0],
                       last=tok, empty=jnp.zeros_like(st["empty"]))
            return st2, psi_ext.max()

        toks = jnp.full((L, BW), 3, jnp.int32)
        _, outs = jax.lax.scan(body, state, toks)
        return outs.sum()

    t_ctc = timeit(jax.jit(ctc_only), ctc_t, len_t, reps=reps)
    add(f"ctc-scores x{L}", t_ctc)

    t_beam = dict(rows)[f"beam@{L}"]
    add("topk+gather+lm (residual)",
        t_beam - t_att - t_ctc - dict(rows)["encode"])


if __name__ == "__main__":
    main(sys.argv[1:])
