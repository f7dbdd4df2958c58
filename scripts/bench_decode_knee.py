#!/usr/bin/env python
"""Post-hoist batch-knee sweep for the decode-path bench operating points.

bench.py's flagship full-beam section runs at B=32 — a knee measured in
round 2, BEFORE the round-4 cross-attention K/V hoist cut the joint beam's
per-step FLOPs ~50x. A latency-bound loop whose per-step work collapsed
should amortize over a much wider batch, so the knee has likely moved;
same question for the greedy e2e section (B=8 = 512 frames / Tc=64) and
the cascade/universal deployment sections (B=64).

Sweeps, on the real chip (run on a QUIET box — CLAUDE.md gotcha):
  flagship   transformer_hybrid joint beam 8 + LM 0.4, clip-aligned Tc=64
  cascade    transcribe_cascade on whole clips at the 96-frame bucket
  greedy     preprocess+bigru+CTC-greedy one-program e2e at Tc=64

Usage: python scripts/bench_decode_knee.py [sections=flagship,cascade,greedy]
           [Bs=16,32,64,128] [reps=5] [clips=128]
Prints one JSON line per (section, B).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from lipreading_tpu.config import parse_overrides


def main(argv):
    args = parse_overrides(argv)
    sections = str(args.pop("sections", "flagship,cascade,greedy")).split(",")
    Bs = [int(x) for x in str(args.pop("Bs", "16,32,64,128")).split(",")]
    reps = int(args.pop("reps", 5))
    n_clips = int(args.pop("clips", 128))

    import jax
    import jax.numpy as jnp

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.infer import transcribe, transcribe_cascade
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.ops.preprocess import preprocess_clips, \
        preprocess_frames
    from lipreading_tpu.preproc_training import load_assets, \
        load_release_model

    det_np, ert_np = load_assets()
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)

    need = min(n_clips, max(Bs))
    print(f"# rendering {need} fixture clips...", file=sys.stderr)
    clips = [make_clip(100 + i) for i in range(need)]
    print(f"# backend={jax.default_backend()}", file=sys.stderr)

    def stack_clips(B, Tc):
        sh = clips[0].frames.shape[1:]
        st = np.zeros((B, Tc) + sh, np.uint8)
        ln = np.zeros((B,), np.int32)
        for i in range(B):
            f = clips[i % len(clips)].frames[:Tc]
            st[i, : f.shape[0]] = f
            ln[i] = f.shape[0]
        return st, ln

    if "flagship" in sections or "cascade" in sections:
        rel = load_release_model("transformer_hybrid")
        fparams, fcfg = rel

    if "flagship" in sections:
        for B in Bs:
            st, ln = stack_clips(B, 64)
            rois = preprocess_clips(det, ert, jnp.asarray(st),
                                    fcfg.preprocess)
            lens = jnp.asarray(ln)
            nfr = int(ln.sum())
            transcribe(fparams, fcfg, rois, lens, beam=8, lm_weight=0.4)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = transcribe(fparams, fcfg, rois, lens, beam=8,
                                 lm_weight=0.4)
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({"section": "flagship", "B": B,
                              "ms_per_call": round(dt * 1e3, 1),
                              "fps": round(nfr / dt, 1)}), flush=True)

    if "cascade" in sections:
        for B in Bs:
            st, ln = stack_clips(B, 96)
            rois = preprocess_clips(det, ert, jnp.asarray(st),
                                    fcfg.preprocess)
            lens = jnp.asarray(ln)
            nfr = int(ln.sum())
            transcribe_cascade(fparams, fcfg, rois, lens, beam=8,
                               lm_weight=0.4)
            t0 = time.perf_counter()
            n_res = 0
            for _ in range(reps):
                _, nr = transcribe_cascade(fparams, fcfg, rois, lens,
                                           beam=8, lm_weight=0.4)
                n_res += nr
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({"section": "cascade", "B": B,
                              "ms_per_call": round(dt * 1e3, 1),
                              "fps": round(nfr / dt, 1),
                              "rescored_frac": round(n_res / (reps * B), 3)},
                             ), flush=True)

    if "greedy" in sections:
        from lipreading_tpu.models.lipreader import ctc_logits as ctc_head
        from lipreading_tpu.models.lipreader import encode
        from lipreading_tpu.ops.decode import ctc_greedy_ids

        rel = load_release_model()
        params, cfg = rel
        Tc = 64
        for B in Bs:
            st, ln = stack_clips(B, Tc)
            lens = jnp.asarray(np.full((B,), Tc, np.int32))
            flat = jnp.asarray(st)

            @jax.jit
            def e2e(fr):
                rois = preprocess_frames(
                    det, ert, fr.reshape(-1, *fr.shape[2:]), cfg.preprocess)
                rois = rois.reshape(B, Tc, cfg.preprocess.roi_size,
                                    cfg.preprocess.roi_size)
                enc = encode(params, cfg, rois, lens)
                return ctc_greedy_ids(ctc_head(params, enc), lens)

            jax.block_until_ready(e2e(flat))
            t0 = time.perf_counter()
            for _ in range(reps):
                out = e2e(flat)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({"section": "greedy", "B": B,
                              "ms_per_call": round(dt * 1e3, 1),
                              "fps": round(B * Tc / dt, 1)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
