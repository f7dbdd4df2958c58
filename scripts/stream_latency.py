#!/usr/bin/env python
"""Streaming real-time factor + per-chunk latency on the real chip.

SERVING.md's streaming row claims "real-time" but no number backs it (the
same unmeasured-claim class VERDICT r4 flagged). This measures it: a
multi-clip stream is fed chunk by chunk (webcam-style, ``chunk`` frames =
chunk/25 s of video) through StreamingTranscriber; per-chunk wall times are
recorded after a full warmup pass has compiled every program (jit caches
are process-wide, so a fresh transcriber replays the compiled path).

Reported per config:
  rtf             total processing time / stream duration (25 fps);
                  < 1.0 means the stream is processed faster than it
                  arrives — real-time capable with margin 1/rtf
  chunk_ms p50/p95/max   per-chunk latency distribution (the p95 captures
                  the decode-bearing chunks: a decode fires every
                  ``decode_every`` buffered frames)

Configs measured (mirrors scripts/stream_eval.py's quality ladder):
  greedy   untracked, beam=1 — the cheapest live path
  quality  tracked + cut_flush, beam + LM tail — the measured-best
           styled-stream config (BASELINE.md round-5 ladder)

Usage: python scripts/stream_latency.py [release=universal4] [clips=3]
           [chunk=8] [window=64] [beam=4] [lm_weight=0.4]
           [assets_variant=robust] [configs=greedy,quality]
Prints one JSON line per config.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from lipreading_tpu.config import parse_overrides  # noqa: E402

FPS = 25.0


def main(argv):
    args = parse_overrides(argv)
    release = str(args.pop("release", "universal4"))
    n_clips = int(args.pop("clips", 3))
    chunk = int(args.pop("chunk", 8))
    window = int(args.pop("window", 64))
    beam = int(args.pop("beam", 4))
    lm_weight = float(args.pop("lm_weight", 0.4))
    assets_variant = str(args.pop("assets_variant", "robust"))
    configs = str(args.pop("configs", "greedy,quality")).split(",")
    if args:
        raise SystemExit(f"unknown args: {sorted(args)}")

    import numpy as np

    import jax

    from lipreading_tpu.fixtures import make_clip
    from lipreading_tpu.metrics import cer
    from lipreading_tpu.ops.detector import params_to_jax
    from lipreading_tpu.ops.ert import model_to_jax
    from lipreading_tpu.preproc_training import (
        load_assets,
        load_presence,
        load_release_model,
    )
    from lipreading_tpu.streaming import StreamingTranscriber

    det_np, ert_np = load_assets(variant=assets_variant)
    det, ert = params_to_jax(det_np), model_to_jax(ert_np)
    presence = load_presence(variant=assets_variant)
    rel = load_release_model(f"transformer_hybrid_{release}"
                             if not release.startswith("transformer")
                             else release)
    if rel is None:
        raise SystemExit(f"release {release!r} missing")
    params, cfg = rel

    clips = [make_clip(33001 + i, cfg.data) for i in range(n_clips)]
    frames = np.concatenate([c.frames for c in clips])
    truth = " ".join(c.text for c in clips)
    dur_s = frames.shape[0] / FPS
    print(f"# stream: {frames.shape[0]} frames = {dur_s:.1f} s of video, "
          f"chunk={chunk} ({chunk / FPS * 1e3:.0f} ms), "
          f"backend={jax.default_backend()}", file=sys.stderr)

    def build(kind):
        if kind == "greedy":
            return StreamingTranscriber(
                params, cfg, det, ert, window=window, decode_every=12,
                chunk_bucket=chunk, beam=1)
        return StreamingTranscriber(
            params, cfg, det, ert, window=window, decode_every=12,
            chunk_bucket=chunk, beam=beam, lm_weight=lm_weight,
            tracked=True, presence=presence)

    for kind in configs:
        st = build(kind)                      # warmup pass: compile all
        for lo in range(0, frames.shape[0], chunk):
            st.feed(frames[lo:lo + chunk])
        st.finish()

        st = build(kind)                      # timed pass, warm programs
        times = []
        for lo in range(0, frames.shape[0], chunk):
            t0 = time.perf_counter()
            st.feed(frames[lo:lo + chunk])
            times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        text = st.finish()
        finish_ms = (time.perf_counter() - t0) * 1e3
        total = sum(times)
        print(json.dumps({
            "config": kind,
            "rtf": round(total / dur_s, 4),
            "margin": round(dur_s / total, 1),
            "chunk_ms_p50": round(float(np.percentile(times, 50)) * 1e3, 1),
            "chunk_ms_p95": round(float(np.percentile(times, 95)) * 1e3, 1),
            "chunk_ms_max": round(max(times) * 1e3, 1),
            "finish_ms": round(finish_ms, 1),
            "chunks": len(times),
            "chunk_frames": chunk,
            "stream_s": round(dur_s, 1),
            "cer": round(cer(text, truth), 4),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
